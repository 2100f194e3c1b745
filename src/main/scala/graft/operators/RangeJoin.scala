package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: pair each point row with every
  * interval row of the same key whose [lo, hi] contains the point.
  * Written naively (`t BETWEEN lo AND hi` inside a join condition) the
  * planner has no equi-key and must fall back to a per-key nested loop —
  * the classic range-join scale trap.
  *
  * Shape (the 100 TB contract): BUCKETIZE time. Each point lands in
  * exactly ONE fixed-width bucket; each interval is replicated to the
  * buckets it overlaps (⌈len/width⌉+1 copies, a bounded constant for
  * bounded interval lengths). The join is then a plain EQUI-join on
  * (key..., bucket) — hash-partitioned, AQE-splittable, no nested loop —
  * followed by the exact range predicate. A point matches in exactly one
  * bucket, so no dedup pass is needed. Pick `bucketWidth` near the
  * typical interval length: too small inflates interval replication,
  * too large inflates the per-bucket candidate set.
  */
object RangeJoin {

  /** Inner join of `points` with `intervals` on `keys` and containment
    * `points(t) BETWEEN intervals(lo) AND intervals(hi)` (inclusive).
    * Output: all columns of both inputs (callers project). Intervals
    * with lo > hi match nothing (as in SQL). Time columns are integral
    * (epochs); `bucketWidth` must be positive. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], t: String, lo: String, hi: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet) -- keys
    require(overlap.isEmpty, s"overlapping non-key columns: $overlap")
    // exact integer FLOOR division, valid for negative epochs and the
    // full long range: subtract the positive modulus first, then `div`
    // on the exact multiple — no double roundtrip (a double loses
    // integer precision past 2^53, i.e. for nano-scale epochs)
    def bucketOf(name: String) = expr(
      s"(`$name` - pmod(`$name`, ${bucketWidth}L)) div ${bucketWidth}L")
    val pb = points.withColumn("__b", bucketOf(t))
    val ib = intervals.where(col(lo) <= col(hi))
      .withColumn("__b", explode(sequence(bucketOf(lo), bucketOf(hi))))
    pb.join(ib, keys :+ "__b")
      .where(col(t) >= col(lo) && col(t) <= col(hi))
      .drop("__b")
  }
}
