package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS) which Spark's
  * vectorized reader rejects outright; we read it as raw long nanos
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds —
  * the exact same truncation DuckDB applies when it reads the file, so the
  * two engines see identical timestamp values. The division must be done
  * in integer space (`DIV`): epoch-nanos ≈ 1.7e18 does not fit a double's
  * 53-bit mantissa.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Pin the session timezone here, not only in build.sbt's forked-run
    // javaOptions: a driver that builds its own SparkSession would
    // otherwise silently derive day_type/hour/date in machine-local time.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }
}
