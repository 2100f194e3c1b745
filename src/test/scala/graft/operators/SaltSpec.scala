package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join correctness (row-identical to the plain join on skewed data). */
class SaltSpec extends SparkSpec {

  test("saltedJoin equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of probe rows share key 1 — the classic hot key.
    val probe = (1L to 1000L).map(i =>
      (if (i <= 900) 1L else i % 50L, i, s"p$i")).toDF("k", "seq", "payload")
    val build = (0L to 49L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = probe.join(build, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).sorted
    val salted = Salt.saltedJoin(probe, build, Seq("k"), buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).sorted
    assert(salted === plain)
  }

  test("AQE skew-join splits the hot key's sort-merge partition at " +
    "runtime (skew=true in the final adaptive plan) and saltedJoin " +
    "produces the identical rows — the declarative fallback for shapes " +
    "AQE cannot split") {
    import spark.implicits._
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // thresholds scaled to fixture size; production keeps the defaults
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // force the sort-merge shape — skew split only applies to SMJ
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // 95% of probe rows share key 7: one reduce partition dwarfs the rest
      val probe = (1L to 20000L).map(i =>
        (if (i <= 19000) 7L else i % 64L, i)).toDF("k", "seq")
      val build = (0L to 63L).map(k => (k, s"dim$k")).toDF("k", "name")
      val aqe = probe.join(build, Seq("k"))
      val aqeRows = aqe.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
      val finalPlan = aqe.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the hot partition skewed:\n$finalPlan")
      val salted = Salt.saltedJoin(probe, build, Seq("k"), buckets = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
      assert(salted === aqeRows)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("salt column spreads a hot key across buckets") {
    import spark.implicits._
    val probe = (1L to 400L).map(i => (1L, i)).toDF("k", "seq")
    val buckets = probe
      .select(Salt.saltCol(8, Seq(col("k"), col("seq"))).as("s"))
      .groupBy("s").count().collect()
    assert(buckets.length === 8)                 // all buckets hit
    assert(buckets.map(_.getLong(1)).max < 150L) // no bucket dominates
  }
}
