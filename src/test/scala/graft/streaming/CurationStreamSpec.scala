package graft.streaming

import graft.SparkSpec
import graft.text.CorpusOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming ingestion of the curation stages: per-DOCUMENT operators
  * (Gopher rules, code-switch) are split-invariant — each document's
  * verdict depends only on its own tokens — so composing them over
  * foreachBatch micro-batches (the S9 connector pattern) must equal the
  * one-pass batch result on the same corpus, for any batch boundary.
  * Corpus-RELATIVE operators (the q214 above-corpus-mean rule, df-based
  * tf-idf) are NOT per-batch streamable and are deliberately absent
  * here; their streaming spelling is the side-input pattern
  * (RealtimeStream's broadcast-refresh), not a per-batch re-fit, which
  * would silently change meaning with the batch size. */
class CurationStreamSpec extends SparkSpec {

  private val docs = Seq(
    (1L, "the a of data table fast scan merge hash row value sort"),
    (2L, "the the the the the the"),
    (3L, "join query group the a of join query group"),
    (4L, ""),
    (5L, "a b c d e f g h i j k l m n o p q r s t"),
    (6L, "the quick brown fox jumps over the lazy dog of a kind"))

  private def gopher(df: DataFrame): DataFrame =
    CorpusOps.gopherRules(df, "doc_id", "text",
      stopwords = Seq("the", "a", "of"), minTokens = 3L, maxTokens = 15L,
      minAvgLen = 2L, maxAvgLen = 8L, minStop = 1L,
      maxTopShareNum = 1L, maxTopShareDen = 2L)

  test("per-document curation over foreachBatch micro-batches == the " +
    "one-pass batch result, for gopherRules AND codeSwitch, across an " +
    "uneven batch split") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val collected =
      new java.util.concurrent.ConcurrentLinkedQueue[Seq[AnyRef]]()
    val in = MemoryStream[(Long, String)]
    val q = in.toDS.toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val g = gopher(batch).collect()
        val c = CorpusOps.codeSwitch(batch, "doc_id", "text").collect()
        g.foreach(r => collected.add(Seq("g", r.toSeq.mkString("|"))))
        c.foreach(r => collected.add(Seq("c", r.toSeq.mkString("|"))))
        () // Unit — the overload the Scala API expects
      }
      .outputMode("update").start()
    try {
      in.addData(docs.take(2): _*)
      q.processAllAvailable()
      in.addData(docs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = {
      import scala.jdk.CollectionConverters._
      collected.asScala.map(s => (s.head, s(1))).toSet
    }

    val batchDf = docs.toDF("doc_id", "text")
    val batch =
      gopher(batchDf).collect()
        .map(r => ("g": AnyRef, r.toSeq.mkString("|"): AnyRef)).toSet ++
      CorpusOps.codeSwitch(batchDf, "doc_id", "text").collect()
        .map(r => ("c": AnyRef, r.toSeq.mkString("|"): AnyRef)).toSet

    assert(streamed === batch)
    // non-vacuous: both keeps and rejects are present in the verdicts
    val keeps = gopher(batchDf).collect()
      .map(r => r.getLong(r.length - 1)).toSet
    assert(keeps === Set(0L, 1L))
  }
}
