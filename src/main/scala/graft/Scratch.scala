package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
// Throwaway plan-inspection / experiment runner (not part of the library).
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args(0) == "skewbench") { skewBench(spark, args(1)); spark.stop(); return }
    val df = SparkEntry.queries(args(0))(spark, args(1))
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(s"ELAPSED ${(System.nanoTime() - t0) / 1e9}")
    spark.stop()
  }

  /** Skew experiment backing the README's AQE-vs-salting numbers: a 90%-
    * hot-key fact-dim join over events, run as (a) plain sort-merge with
    * AQE off, (b) AQE skew-join split, (c) graft.operators.Salt. All
    * three produce identical rows (SaltSpec pins that); this measures
    * the wall-clock shape of each on real sf data. */
  private def skewBench(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    val ev = Tables.t(spark, dir, "events")
      .select(col("event_id"),
        when(pmod(xxhash64(col("event_id")), lit(10L)) < 9L, lit(7L))
          .otherwise(pmod(xxhash64(col("event_id"), lit(1)), lit(64L)))
          .as("k"))
    val build = spark.range(64).select(col("id").as("k"),
      concat(lit("dim"), col("id")).as("name"))
    def conf(kvs: (String, String)*): Unit = kvs.foreach { case (k, v) =>
      spark.conf.set(k, v) }
    def time(label: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"$label%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    conf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    ev.count() // warm the scan
    conf("spark.sql.adaptive.enabled" -> "false")
    time("plain-smj") { ev.join(build, Seq("k")) }
    conf("spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // sf0.1 partitions are far below the 256 MB production default —
      // scale the trigger down so the splitter engages at test scale
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1MB")
    time("aqe-skew") { ev.join(build, Seq("k")) }
    conf("spark.sql.adaptive.enabled" -> "false")
    time("salted-32") {
      graft.operators.Salt.saltedJoin(ev, build, Seq("k"), buckets = 32)
    }
  }
}
