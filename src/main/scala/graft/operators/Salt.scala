package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles (SURVEY.md §4 / the 100 TB design
  * rules).
  *
  * DECISION RULE, measured (90%-hot-key fact-dim join over events at
  * sf0.1, `runMain graft.Scratch skewbench <dir>`: plain sort-merge
  * 1.44 s, AQE skew split 0.48 s, saltedJoin ×32 0.93 s):
  *
  *  1. DEFAULT: leave AQE's skew split on and the join un-hinted. When it
  *     applies it wins — it splits the oversized partition at runtime,
  *     pays no build-side replication, and needs no code change (the
  *     measured 3× over plain SMJ).
  *  2. SALT when AQE structurally cannot split: (a) the skewed side feeds
  *     a grouping/aggregation on the same key (AQE must not split a
  *     partition an aggregate needs whole); (b) the plan is not a
  *     sort-merge/shuffled-hash join AQE knows how to rewrite; (c) one
  *     single key's rows overwhelm even a split partition's reducer
  *     (power-law ids, null-heavy foreign keys) — a split still leaves
  *     every sub-partition hot.
  *  3. Salting costs ×buckets BUILD replication (the measured 2× gap to
  *     AQE on a shape both can handle) — size `buckets` to the hot key's
  *     overload factor, not higher, and keep the build side broadcast-
  *     small relative to it.
  *
  * SaltSpec pins row-identity of all three paths and asserts the AQE
  * plan actually lands `skew=true`.
  *
  * Shape: scatter the skewed (probe) side's rows across `buckets`
  * sub-keys derived deterministically from row content, and replicate the
  * other (build) side once per bucket, joining on (key, salt). Results are
  * exactly those of the unsalted join.
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
