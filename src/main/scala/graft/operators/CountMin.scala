package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.SignatureKernels
import graft.text.TextAnalysis

/** Count-Min sketch (Cormode & Muthukrishnan 2005) over a keyed count
  * stream — the FIXED-SIZE frequency summary: depth × width counters
  * whose size never grows with the corpus, mergeable by cell-wise
  * addition (streams, partitions, days), answering point frequency
  * queries with a one-sided error: estimate ≥ true count always,
  * estimate ≤ true + ε·N with probability 1−δ (ε = e/width,
  * δ = e^−depth).
  *
  * Spark-first shape: building the sketch is ONE map-side-combined hash
  * aggregate over (depth × rows) slim exploded rows — the counters
  * (depth·width rows, e.g. 4×256) are broadcast-sized by construction,
  * so every estimate join is a broadcast join no matter how large the
  * keyed input is. At 100 TB the sketch is the only state that moves.
  *
  * Fully oracle-checkable BY DESIGN: the depth hashes are the affine
  * universal family h_d(key) = ((a_d·poly31(key) + b_d) mod 1e9+7) mod
  * width over [[TextAnalysis.charPolyHash]] — the
  * [[SignatureKernels.polyCoeffs]] constants the DuckDB oracle embeds as
  * literals (the q57/q58 discipline), never an engine-internal hash.
  */
object CountMin {

  /** The depth affine rows (d, a_d, b_d) as literal structs. */
  private def coeffs(depth: Int): Seq[(Int, Long, Long)] = {
    val (as, bs) = SignatureKernels.polyCoeffs(depth)
    (0 until depth).map(d => (d, as(d), bs(d)))
  }

  /** Bucket column for depth row `d` over a precomputed poly hash. */
  private def bucket(ph: Column, a: Long, b: Long, width: Int): Column =
    ((lit(a) * ph + lit(b)) % lit(SignatureKernels.PolyMod)) % lit(width.toLong)

  /** The depth cells `(d, w)` a key hashes to, as an array of structs —
    * the ONE derivation shared by [[sketch]], [[estimate]], and the
    * streaming aggregation
    * ([[graft.streaming.StreamingAnalytics.cmsStream]]), so batch and
    * stream can never hash a key differently. */
  def cellArray(key: Column, depth: Int, width: Int): Column = {
    val ph = TextAnalysis.charPolyHash(key)
    array(coeffs(depth).map { case (d, a, b) =>
      struct(lit(d.toLong).as("d"), bucket(ph, a, b, width).as("w"))
    }: _*)
  }

  /** The sketch: (d, w, counter) — depth·width rows, counter = exact sum
    * of `weightCol` over keys hashing to that cell. `keyed` must carry one
    * row per (key, weight) observation group; duplicate keys are fine
    * (sums add). */
  def sketch(keyed: DataFrame, keyCol: String, weightCol: String,
             depth: Int, width: Int): DataFrame =
    keyed
      .select(col(weightCol).as("__wt"),
        explode(cellArray(col(keyCol), depth, width)).as("__cell"))
      .groupBy(col("__cell.d").as("d"), col("__cell.w").as("w"))
      .agg(sum(col("__wt")).as("counter"))

  /** Point-frequency estimates for `queries` (one row per DISTINCT key,
    * any extra columns carried through as grouping keys) against a
    * [[sketch]]: min over the depth cells the key hashes to. The sketch
    * side is broadcast — depth·width rows by construction. Keys absent
    * from every cell estimate 0 (an empty sketch cell can only arise for
    * a key no observation hashed with — CMS's "0 means truly absent"). */
  def estimate(queries: DataFrame, cms: DataFrame, keyCol: String,
               depth: Int, width: Int): DataFrame =
    queries
      .withColumn("__cell",
        explode(cellArray(col(keyCol), depth, width)))
      .join(broadcast(cms), col("__cell.d") === cms("d") &&
        col("__cell.w") === cms("w"), "left")
      .groupBy(queries.columns.toIndexedSeq.map(col): _*)
      .agg(coalesce(min(col("counter")), lit(0L)).as("cms_estimate"))
}
