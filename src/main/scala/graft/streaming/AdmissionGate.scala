package graft.streaming

import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming near-duplicate ADMISSION GATE — the 100 TB ingestion shape
  * the batch dedup ladder (q57-q59) feeds into: documents arrive as a
  * stream and each micro-batch is admitted/rejected against the
  * ACCUMULATED corpus, so the curated corpus never contains a document
  * that duplicates anything that arrived before it.
  *
  * Two gates, both mirrored exactly by the batch oracle (q267):
  *
  *   1. EXACT gate: a document whose full text already arrived (in an
  *      earlier batch, or under a smaller id in the SAME batch) is
  *      rejected. This is the `min(doc_id) per text` collapse of the
  *      batch pipeline (q58's `uniq` CTE), applied incrementally.
  *   2. NEAR-DUP gate: exact-gate survivors are MinHash-banded
  *      (poly-hash family — every ingredient oracle-expressible) and
  *      probed against the accumulated BAND-POSTINGS state; co-bucket
  *      candidates are verified with exact Jaccard, and a new document
  *      scoring >= `minJaccard` against ANY earlier exact-survivor is
  *      rejected. The posting state accumulates every exact-survivor
  *      (admitted or near-rejected — matching the batch answer, where
  *      candidates are generated over all collapsed docs), so the final
  *      admitted set equals the batch q58(uncapped)->q59->drop-larger
  *      answer on the same data: a doc is admitted iff it has no
  *      verified pair with a smaller-id exact-survivor.
  *
  * State lives in two append-only parquet directories (the streaming
  * twin of the batch pipeline's materialized artifacts):
  * `<out>.docs` (doc_id, text — exact gate + verification) and
  * `<out>.bands` (band, band_key, doc_id — the LSH posting index). Each
  * batch appends ONLY its own survivors: the corpus is never re-banded
  * (the incremental contract of
  * [[graft.dedup.Dedup.incrementalPolyMinhashPairs]], here with the
  * postings genuinely persisted across batches instead of recomputed).
  * Buckets are deliberately UNCAPPED: an admission gate must not
  * silently skip comparisons, and capping incrementally would diverge
  * from the batch answer the moment a bucket crosses the cap
  * mid-stream. At 100 TB the same layout holds — postings and docs
  * become snapshot tables, the per-batch probe is a batch-side band
  * shuffle against a bucketed posting table, and verification reads
  * materialized sorted shingle arrays rather than re-shingling (here
  * re-shingled per batch via [[Dedup.jaccardOnPairs]], which at replay
  * scale is the cheaper call).
  *
  * Replay-scoped, like the harness's other sinks: the appends are not
  * idempotent under batch retry (fresh state dirs per run, deterministic
  * file release — q266 carries the idempotent-sink discipline). */
object AdmissionGate {

  /** Process one micro-batch of (doc_id, text): append admitted doc_ids
    * to `outDir`, and fold the batch's exact-survivors into the gate
    * state. Batches must arrive in ascending doc_id slices (the replay
    * contract) so "earlier" and "smaller id" coincide — both gates and
    * the oracle order by doc_id. */
  def admitBatch(batch: DataFrame, outDir: String,
                 numHashes: Int = 64, bands: Int = 16,
                 minJaccard: Double = 0.5): Unit = {
    val spark = batch.sparkSession
    val docsDir = outDir + ".docs"
    val bandsDir = outDir + ".bands"
    val fs = new Path(outDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val b0 = batch.select(col("doc_id"), col("text"))
    // within-batch exact collapse: first (min-id) doc of each text
    val reps = b0.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
    // cross-batch exact gate: drop texts the accumulated corpus has seen
    val seenDocs =
      if (fs.exists(new Path(docsDir))) spark.read.parquet(docsDir)
      else b0.limit(0)
    val survivors = reps.join(seenDocs.select(col("text").as("__t")),
        col("text") === col("__t"), "left_anti")
      .select(col("doc_id"), col("text"))
      // one in-memory copy per batch: survivors feed banding, candidate
      // probing, verification, AND two state appends — recomputing the
      // anti-join per consumer would re-scan the accumulated docs state
      .localCheckpoint(true)
    val rows = numHashes / bands
    val newBands = survivors
      .select(col("doc_id"),
        TextAnalysis.bigramShingles(TextAnalysis.tokens(col("text")))
          .as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"),
        Dedup.polyMinhashSignature(col("sh"), numHashes).as("sig"))
      .select(col("doc_id"),
        posexplode(array((0 until bands).map(b =>
          slice(col("sig"), b * rows + 1, rows)): _*)))
      .select(col("pos").as("band"), col("col").as("band_key"),
        col("doc_id"))
      .localCheckpoint(true)
    val seenBands =
      if (fs.exists(new Path(bandsDir))) spark.read.parquet(bandsDir)
      else newBands.limit(0)
    // candidates: new-vs-corpus probes of the posting index, plus
    // new-vs-new co-bucket pairs; id_a < id_b is structural (id-ordered
    // slices) and kept as an explicit guard so the oracle equality is
    // literal, not an unchecked invariant
    val cross = seenBands
      .select(col("band"), col("band_key"), col("doc_id").as("id_a"))
      .join(newBands
        .select(col("band"), col("band_key"), col("doc_id").as("id_b")),
        Seq("band", "band_key"))
    val within = newBands
      .select(col("band"), col("band_key"), col("doc_id").as("id_a"))
      .join(newBands
        .select(col("band"), col("band_key"), col("doc_id").as("id_b")),
        Seq("band", "band_key"))
    val cand = cross.unionByName(within)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val rejected = Dedup.jaccardOnPairs(cand,
        seenDocs.unionByName(survivors), "doc_id", "text")
      .where(col("jaccard") >= minJaccard)
      .select(col("id_b").as("doc_id")).distinct()
    survivors.join(rejected, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
      .write.mode("append").parquet(outDir)
    // state grows by the batch's exact-survivors ONLY — including the
    // near-rejected ones, which still index the corpus for later probes
    survivors.write.mode("append").parquet(docsDir)
    if (!newBands.isEmpty)
      newBands.write.mode("append").parquet(bandsDir)
  }
}
