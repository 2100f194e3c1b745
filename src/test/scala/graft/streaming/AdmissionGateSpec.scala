package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The streaming near-dup admission gate (q267): exact gate, near-dup
  * gate, and the semantics that distinguish an admission INDEX from an
  * admitted SET — a rejected document still indexes the corpus, so a
  * later near-dup of a REJECTED doc is itself rejected (the chain case),
  * keeping the streamed answer equal to the batch q58→q59→drop-larger
  * computation. */
class AdmissionGateSpec extends SparkSpec {

  // 12 tokens; B differs from A at one position, C from B at another —
  // so jaccard(A,B) = jaccard(B,C) = 9/13 ≈ 0.69 (>= τ) while
  // jaccard(A,C) = 7/15 ≈ 0.47 (< τ): C can be rejected ONLY through B
  private val A =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
  private val B =
    "alpha bravo charlie dingo echo foxtrot golf hotel india juliet kilo lima"
  private val C =
    "alpha bravo charlie dingo echo foxtrot golf hotel indigo juliet kilo lima"
  private val D = "one two three four five six seven"
  private val E = "red green blue yellow purple orange"
  private val F = "stone river mountain forest cloud valley"

  test("exact gate (within-batch and cross-batch), near-dup gate, and the " +
    "chain case: a doc similar only to a REJECTED doc is still rejected, " +
    "because the index accumulates exact-survivors, not admissions") {
    import spark.implicits._
    // pin the construction the chain case rests on
    val jd = graft.dedup.Dedup.jaccardOnPairs(
        Seq((1L, 30L), (10L, 30L), (1L, 10L)).toDF("id_a", "id_b"),
        Seq((1L, A), (10L, B), (30L, C)).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(jd((1L, 10L)) >= 0.5 && jd((10L, 30L)) >= 0.5, jd)
    assert(jd((1L, 30L)) < 0.5, jd)

    val docs = Seq(
      (1L, A), (2L, A), (5L, D),      // batch 0: A admitted, 2 exact-dup
      (10L, B), (20L, A), (21L, E),   // batch 1: B near-rejected vs 1,
                                      //          20 exact-rejected cross-batch
      (30L, C), (31L, F)              // batch 2: C rejected via REJECTED 10
    ).toDF("doc_id", "text")
    val got = StreamingAnalytics.replayStream(spark, docs,
        "target/aggate_spec", Seq(
        col("doc_id") < 10L,
        col("doc_id") >= 10L && col("doc_id") < 25L,
        col("doc_id") >= 25L),
        updateMode = true,
        updateSink = Some { (df, bid, out) =>
          AdmissionGate.admitBatch(df, out, bid)
        })(st => st)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(1L, 5L, 21L, 31L))
  }

  test("state reads prune at the FILE listing: a probe touching a " +
    "bucket subset reads only that subset's partition files, and the " +
    "bid filter hides the probing batch's own (retry-era) output") {
    import spark.implicits._
    // seed two batches of state through the real writer
    val base = "target/aggate_prune"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    AdmissionGate.admitBatch(Seq((1L, A), (5L, D)).toDF("doc_id", "text"),
      base, batchId = 0L)
    AdmissionGate.admitBatch(Seq((21L, E), (31L, F)).toDF("doc_id", "text"),
      base, batchId = 1L)
    val shDir = base + ".sh"
    val all = spark.read.option("basePath", shDir).parquet(shDir)
    val allFiles = all.select(input_file_name()).distinct().count()
    val allBuckets = all.select("ib").distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    assert(allBuckets.size >= 2,
      s"test docs collapsed into one id bucket ($allBuckets) - " +
        "pruning would be unobservable")
    // prune to ONE bucket: only that bucket's files are listed
    val one = AdmissionGate.prunedState(spark, shDir, "ib",
      Seq(allBuckets.head), batchId = 2L, all.limit(0))
    val oneFiles = one.select(input_file_name()).distinct().count()
    assert(oneFiles < allFiles,
      s"bucket pruning read all $allFiles files")
    one.select(input_file_name()).distinct().collect().foreach { r =>
      assert(r.getString(0).contains(s"/ib=${allBuckets.head}/"),
        s"file outside the pruned bucket: ${r.getString(0)}")
    }
    // bid filter: a batch re-reading state at its own batchId must not
    // see batch 1's rows (the retry-idempotence contract) — only
    // batch 0's
    val preBatch1 = AdmissionGate.prunedState(spark, shDir, "ib",
      allBuckets, batchId = 1L, all.limit(0))
    val ids = preBatch1.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 5L),
      s"bid<1 read leaked batch-1 state: $ids")
    // and re-running batch 1 (a retry) converges: same admitted set
    AdmissionGate.admitBatch(Seq((21L, E), (31L, F)).toDF("doc_id", "text"),
      base, batchId = 1L)
    val admitted = spark.read.parquet(base)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(admitted === Seq(1L, 5L, 21L, 31L))
  }
}
