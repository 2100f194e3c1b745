package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Product-quantization ADC semantics: exact distances when the corpus is
  * its own codebook, rank/tie-break determinism, and clustered-data recall
  * after a Lloyd iteration. */
class PqSpec extends SparkSpec {

  private def toDF(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def quant(v: Seq[Float]): Seq[Long] =
    v.map(x => math.round(x.toDouble * Similarity.Scale))

  test("corpus ⊆ seeds + trainIters=0 → ADC distance IS the exact " +
    "squared L2 distance (every vector reconstructs itself)") {
    val rnd = new scala.util.Random(7)
    val dim = 8
    val corpus = (0L until 16L).map(i =>
      i -> Seq.fill(dim)(rnd.nextGaussian().toFloat))
    val queries = corpus.take(3)
    val got = Similarity.pqTopK(toDF(queries), toDF(corpus),
        "vec_id", "embedding", k = 16, numSubspaces = 4,
        codebookSize = 16, trainIters = 0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for ((qid, qv) <- queries; (cid, cv) <- corpus) {
      val exact = quant(qv).zip(quant(cv))
        .map { case (a, b) => (a - b) * (a - b) }.sum
      assert(got((qid, cid)) === exact,
        s"adist(q=$qid, c=$cid) should be the exact squared L2")
    }
  }

  test("k bounds the output; ranks are 1..k; duplicate vectors tie-break " +
    "by ascending id") {
    val dim = 4
    val base = Seq(1.0f, 2.0f, 3.0f, 4.0f)
    // 20 distinct vectors plus two IDENTICAL ones far from the rest
    val rnd = new scala.util.Random(13)
    val corpus = (0L until 20L).map(i =>
      i -> Seq.fill(dim)(rnd.nextGaussian().toFloat)) ++
      Seq(100L -> base, 101L -> base)
    val queries = Seq(500L -> base)
    val top3 = Similarity.pqTopK(toDF(queries), toDF(corpus),
        "vec_id", "embedding", k = 3, numSubspaces = 2,
        codebookSize = 8, trainIters = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(top3.length === 3)
    assert(top3.map(_._3).sorted.toSeq === Seq(1L, 2L, 3L))
    // full ranking: identical vectors share one ADC distance (identical
    // codes), and the tie resolves to the smaller id
    val all = Similarity.pqTopK(toDF(queries), toDF(corpus),
        "vec_id", "embedding", k = corpus.size, numSubspaces = 2,
        codebookSize = 8, trainIters = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(all.length === corpus.size)
    assert(all.map(_._3).sorted.toSeq === (1L to corpus.size.toLong))
    val d100 = all.find(_._1 == 100L).get
    val d101 = all.find(_._1 == 101L).get
    assert(d100._2 === d101._2)
    assert(d100._3 === d101._3 - 1, "equal distances tie-break by id")
  }

  test("clustered corpus + one Lloyd iteration: each query's top hits come " +
    "from its own cluster") {
    val dim = 8
    val rnd = new scala.util.Random(3)
    // two tight clusters around distant prototypes
    def around(proto: Float): Seq[Float] =
      Seq.fill(dim)(proto + rnd.nextGaussian().toFloat * 0.01f)
    val a = (0L until 20L).map(i => i -> around(5.0f))
    val b = (100L until 120L).map(i => i -> around(-5.0f))
    val corpus = a ++ b
    val queries = Seq(0L -> a.head._2, 100L -> b.head._2)
    val got = Similarity.pqTopK(toDF(queries), toDF(corpus),
        "vec_id", "embedding", k = 5, numSubspaces = 4,
        codebookSize = 4, trainIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    got.foreach { case (qid, cid) =>
      if (qid == 0L) assert(cid < 100L, s"query 0 pulled $cid from cluster B")
      else assert(cid >= 100L, s"query 100 pulled $cid from cluster A")
    }
  }

  test("ivfPqTopK with nProbe = nCentroids degenerates to pqTopK exactly " +
    "(the coarse gate admits everything)") {
    val rnd = new scala.util.Random(21)
    val dim = 8
    val corpus = (0L until 60L).map(i =>
      i -> Seq.fill(dim)(rnd.nextGaussian().toFloat))
    val queries = corpus.take(4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val full = rows(Similarity.ivfPqTopK(toDF(queries), toDF(corpus),
      "vec_id", "embedding", k = 5, nCentroids = 8, nProbe = 8,
      numSubspaces = 2, codebookSize = 8, trainIters = 1))
    val pq = rows(Similarity.pqTopK(toDF(queries), toDF(corpus),
      "vec_id", "embedding", k = 5, numSubspaces = 2,
      codebookSize = 8, trainIters = 1))
    assert(full === pq)
    // narrowing the probe can only SHRINK each query's candidate pool:
    // every (query, hit) at nProbe=1 ranks a candidate also admitted at
    // nProbe=8, and result sets stay k-bounded and rank-complete
    val narrow = Similarity.ivfPqTopK(toDF(queries), toDF(corpus),
      "vec_id", "embedding", k = 5, nCentroids = 8, nProbe = 1,
      numSubspaces = 2, codebookSize = 8, trainIters = 1).collect()
    assert(narrow.length <= 4 * 5)
    val perQuery = narrow.groupBy(_.getLong(0))
    perQuery.values.foreach { rs =>
      assert(rs.map(_.getLong(3)).sorted.toSeq === (1L to rs.length.toLong))
    }
  }

  test("invalid configuration fails fast") {
    val d = toDF(Seq(1L -> Seq(1.0f, 2.0f, 3.0f)))
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(d, d, "vec_id", "embedding", k = 1, numSubspaces = 2)
    }
  }

  test("zero-norm corpus vector stays reachable: it lands in a PROBEABLE " +
    "list and the nProbe=nCentroids degeneracy holds with it present") {
    val rnd = new scala.util.Random(31)
    val dim = 4
    val corpus = (0L until 20L).map(i =>
      i -> Seq.fill(dim)(rnd.nextGaussian().toFloat)) :+
      (99L -> Seq.fill(dim)(0.0f)) // all-zero vector: NULL cosine everywhere
    val queries = corpus.take(2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = rows(Similarity.ivfPqTopK(toDF(queries), toDF(corpus),
      "vec_id", "embedding", k = corpus.size, nCentroids = 4, nProbe = 4,
      numSubspaces = 2, codebookSize = 4, trainIters = 1))
    val pq = rows(Similarity.pqTopK(toDF(queries), toDF(corpus),
      "vec_id", "embedding", k = corpus.size, numSubspaces = 2,
      codebookSize = 4, trainIters = 1))
    assert(full === pq)
    assert(full.exists(_._2 == 99L),
      "the zero-norm vector must be ranked, not dropped into list 0")
  }

  test("wrong-dimension corpus vector fails fast instead of encoding to " +
    "garbage codes") {
    val corpus = Seq(
      1L -> Seq(1.0f, 2.0f, 3.0f, 4.0f),
      2L -> Seq(1.0f, 2.0f)) // short vector
    val queries = Seq(corpus.head)
    val e = intercept[Exception] {
      Similarity.pqTopK(toDF(queries), toDF(corpus),
        "vec_id", "embedding", k = 2, numSubspaces = 2,
        codebookSize = 1, trainIters = 0).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("dim mismatch") ||
        Option(e.getCause).exists(_.getMessage.contains("dim mismatch"))))
  }
}
