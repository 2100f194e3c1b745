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

  /** S6 — JDBC table scan (the reference exports `trip_updates` over a
    * Postgres connection, loader/get_realtime.py:36). Partitioned reads
    * (`partitionColumn` + bounds) split the table across executors; a
    * plain read is a single partition. Untestable in this sandbox (no
    * database, no drivers) — the parquet tables above are the verification
    * substrate; this is the production entry point. */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitionColumn: Option[(String, Long, Long, Int)] = None,
           props: Map[String, String] = Map.empty): DataFrame = {
    val r = props.foldLeft(
      spark.read.format("jdbc").option("url", url).option("dbtable", table)) {
      case (b, (k, v)) => b.option(k, v)
    }
    partitionColumn.fold(r) { case (c, lo, hi, n) =>
      r.option("partitionColumn", c).option("lowerBound", lo)
        .option("upperBound", hi).option("numPartitions", n)
    }.load()
  }
}
