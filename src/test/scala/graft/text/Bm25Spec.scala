package graft.text

import graft.SparkSpec

/** BM25 scoring semantics: hand-computed scores on a tiny corpus, the
  * rare-term-dominates ordering, tie-breaks, and the top-k cut. */
class Bm25Spec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("single-term corpus: score matches the closed form by hand") {
    // 3 docs, query = {cat}. df(cat)=2, N=3, dl = (2, 2, 2), avgdl = 2.
    // idf = (3 - 2 + 0.5) / (2 + 0.5) = 0.6
    // doc 1: tf=1 → 0.6 * (1*2.2) / (1 + 1.2*(0.25 + 0.75*2/2))
    //       = 0.6 * 2.2 / 2.2 = 0.6
    val d = docs((1L, "cat dog"), (2L, "cat bird"), (3L, "dog bird"))
    val out = CorpusOps.bm25TopK(d, "doc_id", "text", Seq("cat"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length === 2) // doc 3 never matches
    assert(out.map(_._1).toSet === Set(1L, 2L))
    out.foreach { case (_, nTerms, score) =>
      assert(nTerms === 1L)
      assert(math.abs(score - 0.6) < 1e-12)
    }
  }

  test("higher tf wins within a term; rarer term outweighs a common one") {
    // "rare" appears in 1 of 4 docs; "common" in all 4.
    val d = docs(
      (1L, "rare common x y"),
      (2L, "common common x y"),
      (3L, "common a b c"),
      (4L, "common d e f"))
    val ranked = CorpusOps
      .bm25TopK(d, "doc_id", "text", Seq("rare", "common"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // doc 1 holds the rare term → top rank despite tf(common)=1 < doc 2's 2
    assert(ranked.head._1 === 1L)
    // doc 2 (tf(common)=2) beats docs 3 and 4 (tf=1)
    val pos = ranked.map(_._1).zipWithIndex.toMap
    assert(pos(2L) < pos(3L) && pos(2L) < pos(4L))
    // equal-score docs 3 and 4 tie-break by ascending id
    assert(pos(3L) < pos(4L))
    assert(ranked.map(_._2).toSeq.sliding(2).forall {
      case Seq(a, b) => a >= b
      case _ => true
    })
  }

  test("topK bounds the output; matched-term count is per-document") {
    val d = docs(
      (1L, "q1 q2"), (2L, "q1"), (3L, "q2"), (4L, "q1 q2 q1"), (5L, "zz"))
    val top2 = CorpusOps
      .bm25TopK(d, "doc_id", "text", Seq("q1", "q2"), topK = 2)
      .collect()
    assert(top2.length === 2)
    val all = CorpusOps
      .bm25TopK(d, "doc_id", "text", Seq("q1", "q2"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all === Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("duplicate and unsorted query terms behave as the sorted set") {
    val d = docs((1L, "a b"), (2L, "b c"), (3L, "c d"))
    val a = CorpusOps.bm25TopK(d, "doc_id", "text", Seq("b", "a", "b"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val b = CorpusOps.bm25TopK(d, "doc_id", "text", Seq("a", "b"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(a.toSeq === b.toSeq)
  }
}
