package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles (SURVEY.md §4 / the 100 TB design
  * rules). AQE's skew-join split handles most cases at runtime; explicit
  * salting is the declarative fallback when one key dominates so heavily
  * that even split partitions overwhelm a reducer (power-law user ids,
  * null-heavy foreign keys), or when the skewed side feeds an aggregation
  * AQE cannot split.
  *
  * Shape: scatter the skewed (probe) side's rows across `buckets`
  * sub-keys derived deterministically from row content, and replicate the
  * other (build) side once per bucket, joining on (key, salt). Results are
  * exactly those of the unsalted join; the build side grows ×buckets, so
  * use for moderate bucket counts on a small-to-medium build side.
  */
object Salt {

  /** Deterministic per-row salt in [0, buckets): content-hashed from
    * `from` columns (use non-key columns so rows of one hot key spread). */
  def saltCol(buckets: Int, from: Seq[Column]): Column =
    pmod(xxhash64(from: _*), lit(buckets.toLong))

  /** Inner equi-join of `probe` (large, possibly skewed) with `build`
    * (replicated ×buckets) on `keys`. Row-identical to
    * `probe.join(build, keys)`. `saltFrom` defaults to all probe columns. */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 buckets: Int, saltFrom: Option[Seq[String]] = None): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val from = saltFrom.getOrElse(probe.columns.toSeq).map(probe(_))
    val p = probe.withColumn("__salt", saltCol(buckets, from))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1L))))
    p.join(b, keys :+ "__salt").drop("__salt")
  }
}
