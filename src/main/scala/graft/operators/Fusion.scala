package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval: combine a lexical ranking (BM25) and
  * a vector ranking (ANN cosine) of the same id domain into one list.
  * Reciprocal-rank fusion (Cormack, Clarke, Büttcher 2009, SIGIR:
  * "Reciprocal rank fusion outperforms Condorcet and individual rank
  * learning methods") needs only the RANKS — no score calibration across
  * scorers — which is exactly what makes it deterministic enough to
  * hash-check: rrf = Σ 1/(k₀ + rank), exact integer ranks through one
  * mirrored double divide per list, summed in fixed (a, b) order.
  */
object Fusion {

  /** Fuse two ranked lists (columns: `idCol`, "rank") by reciprocal-rank
    * fusion with constant `rrfK` (60 in the paper), keeping the top `k`
    * fused ids. Ids present in only one list contribute an exact 0.0 for
    * the missing side (full-outer join); ties break to the smaller id.
    *
    * Scale: inputs are ALREADY bounded top-k lists (the upstream
    * retrieval operators enforce that), so the fusion join is a few
    * hundred slim rows regardless of corpus size; the final cut is a
    * TakeOrdered. */
  def rrf(a: DataFrame, b: DataFrame, idCol: String, k: Int,
          rrfK: Int = 60): DataFrame = {
    require(k > 0, "k must be positive")
    require(rrfK >= 0, "rrfK must be >= 0")
    val fa = a.select(col(idCol), col("rank").as("rank_a"))
    val fb = b.select(col(idCol), col("rank").as("rank_b"))
    val score =
      coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("rank_a").cast("double")),
        lit(0.0)) +
      coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("rank_b").cast("double")),
        lit(0.0))
    fa.join(fb, Seq(idCol), "full_outer")
      .select(col(idCol), col("rank_a"), col("rank_b"), score.as("rrf"))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(k)
  }
}
