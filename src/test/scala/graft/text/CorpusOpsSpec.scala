package graft.text

import graft.SparkSpec

/** Decontamination matching semantics and chunk window arithmetic. */
class CorpusOpsSpec extends SparkSpec {

  test("decontaminate drops exactly the train docs sharing an n-gram " +
    "with the eval set") {
    import spark.implicits._
    val train = Seq(
      (1L, "the model was trained on web data"),
      (2L, "completely unrelated content here today"),
      (3L, "the model was evaluated separately"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, "benchmarks say the model was trained well"))
      .toDF("doc_id", "text")
    // trigrams of doc 1 include "the model was" and "model was trained" —
    // both present in eval; doc 3 shares only "the model was"; doc 2 none
    val kept = CorpusOps.decontaminate(train, eval, "doc_id", "text", n = 3)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L))
    // with 4-grams, doc 3 no longer matches ("the model was evaluated")
    val kept4 = CorpusOps.decontaminate(train, eval, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(kept4 === Set(2L, 3L))
  }

  test("chunkDocuments: stride windows, short final window, empty docs " +
    "emit nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")),
      (2L, "a b"),
      (3L, ""))
      .toDF("doc_id", "text")
    val got = CorpusOps.chunkDocuments(docs, "doc_id", "text",
        chunkSize = 12, stride = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = got.groupBy(_._1)
    // doc 1: starts 0, 8, 16 → lengths 12, 12, 4
    assert(byDoc(1L).map(c => c._2 -> c._3).toSet ===
      Set(0L -> 12L, 1L -> 12L, 2L -> 4L))
    assert(byDoc(1L).find(_._2 == 2L).get._4 === "t17 t18 t19 t20")
    // doc 2: one window of 2 tokens
    assert(byDoc(2L).map(c => (c._2, c._3, c._4)).toSeq === Seq((0L, 2L, "a b")))
    // doc 3: no output
    assert(!byDoc.contains(3L))
  }
}
