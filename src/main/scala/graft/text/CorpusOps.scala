package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level (DataFrame-in, DataFrame-out) text operations for
  * training-data pipelines: eval-set decontamination and fixed-budget
  * token chunking. Column-level building blocks live in
  * [[TextAnalysis]]; these compose them across rows.
  */
object CorpusOps {

  /** Benchmark decontamination: drop every training document sharing at
    * least one `n`-gram with the eval corpus — the standard guard against
    * test-set leakage into pretraining data.
    *
    * Scale: the eval side reduces to a DISTINCT shingle set (benchmarks
    * are tiny next to the corpus — AQE broadcasts it); the train side
    * explodes to slim (id, shingle) postings, so contamination detection
    * is a postings⋈shingles join + distinct ids, and the full-width train
    * rows move only once, through the final left-anti join. Never an
    * all-pairs document comparison. */
  def decontaminate(train: DataFrame, eval: DataFrame,
                    idCol: String, textCol: String, n: Int): DataFrame = {
    val evalShingles = eval
      .select(explode(TextAnalysis.ngramShingles(
        TextAnalysis.tokens(col(textCol)), n)).as("shingle"))
      .distinct()
    val trainPostings = train.select(col(idCol),
      explode(TextAnalysis.ngramShingles(
        TextAnalysis.tokens(col(textCol)), n)).as("shingle"))
    val contaminated = trainPostings.join(evalShingles, "shingle")
      .select(idCol).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Context chunking: split each document's token stream into windows of
    * `size` tokens starting every `stride` tokens (stride < size gives
    * overlapping windows) — the pretraining sequence-packing precursor.
    * Emits (id, chunk_idx, n_chunk_tokens, chunk_text); zero-token
    * documents emit nothing.
    *
    * Per-row generate + slice — no shuffle; the token array is
    * materialized once per row and sliced per chunk (`slice` on a bound
    * column, not an `element_at` re-derivation). */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    val tk = TextAnalysis.tokens(col(textCol))
    docs
      .select(col(idCol), tk.as("__tk"))
      .where(size(col("__tk")) > 0)
      .select(col(idCol),
        explode(sequence(lit(0), size(col("__tk")) - 1, lit(stride)))
          .as("__start"),
        col("__tk"))
      .select(col(idCol),
        (col("__start") / stride).cast("long").as("chunk_idx"),
        size(slice(col("__tk"), col("__start") + 1, lit(chunkSize)))
          .cast("long").as("n_chunk_tokens"),
        array_join(slice(col("__tk"), col("__start") + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }
}
