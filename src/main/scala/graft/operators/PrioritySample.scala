package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted sampling without replacement by PRIORITY SAMPLING
  * (Duffield–Lund–Thorup, "Priority sampling for estimation of arbitrary
  * subset sums", JACM 2007): each row gets priority w/u for a uniform
  * u ∈ (0,1], and the k highest priorities form the sample — a
  * without-replacement draw whose inclusion probability is min(1, w/τ)
  * for the (k+1)-th priority τ, giving unbiased weighted subset-sum
  * estimates. The training-data use: sample a corpus proportionally to a
  * quality/length weight in ONE distributed pass, reproducibly.
  *
  * Determinism discipline (the q45/q100/q108 family rule): u comes from a
  * content hash, not an RNG, and the priority is computed in EXACT integer
  * arithmetic — (w·SCALE) div (h+1) — so there is no float rounding to
  * diverge between engines; the DuckDB oracle mirrors it with `//`.
  * Quantization by the div only introduces ties, and the id column breaks
  * every tie totally.
  *
  * Scale: the top-k is Spark's TakeOrderedAndProject — each partition
  * keeps its local k in a bounded heap and only k·P slim rows reach the
  * driver-side merge; the corpus is never globally sorted. Weights must
  * satisfy w·SCALE < 2^63 (w ≤ ~9.2e6 at the default SCALE). */
object PrioritySample {

  val Scale = 1000000000000L // 10^12: priority resolution per weight unit

  /** Top-`k` rows of `df` by hash-derived priority. `weight` must be a
    * positive long column, `hash` a non-negative long (content hash),
    * `tie` a unique column making the order total. Appends `priority`. */
  def sample(df: DataFrame, k: Int, weight: Column, hash: Column,
             tie: Column): DataFrame =
    df.withColumn("__w", weight).withColumn("__h", hash)
      .withColumn("priority", expr(s"(__w * ${Scale}L) div (__h + 1L)"))
      .drop("__w", "__h")
      .orderBy(col("priority").desc, tie.asc)
      .limit(k)
}
