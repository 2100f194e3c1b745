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
