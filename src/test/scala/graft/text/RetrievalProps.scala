package graft.text

import graft.SparkSpec
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the retrieval family: the distributed
  * operators must EQUAL naive in-memory reference implementations of the
  * same formulas on random small-vocabulary corpora — stronger than
  * example tests because the corpus shape (df skew, doc lengths, missing
  * terms, ties) varies adversarially. */
object RetrievalProps extends Properties("Retrieval") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
  private val genDoc: Gen[String] =
    Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
  private val genCorpus: Gen[List[String]] =
    Gen.chooseNum(2, 10).flatMap(n => Gen.listOfN(n, genDoc))
  private val genTerms: Gen[List[String]] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
      .map(_.distinct)

  private def refBm25(texts: List[String], terms: List[String], topK: Int,
                      k1: Double = 1.2, b: Double = 0.75)
      : Seq[(Long, Long, Double)] = {
    val ts = terms.distinct.sorted
    val toks = texts.map(_.split(" ").filter(_.nonEmpty).toSeq)
    val n = texts.size
    val avgdl = toks.map(_.size.toLong).sum.toDouble / n.toDouble
    val df = ts.map(t => t -> toks.count(_.contains(t))).toMap
    val scored = toks.zipWithIndex.flatMap { case (tk, id) =>
      val contribs = ts.flatMap { t =>
        val tf = tk.count(_ == t).toLong
        if (tf == 0) None
        else Some(
          ((n.toDouble - df(t).toDouble + 0.5) / (df(t).toDouble + 0.5)) *
            (tf.toDouble * (k1 + 1.0)) /
            (tf.toDouble + k1 * ((1.0 - b) + b * tk.size.toDouble / avgdl)))
      }
      if (contribs.isEmpty) None
      // fixed sorted-term order, left-to-right — the operator's contract
      else Some((id.toLong, contribs.size.toLong,
        contribs.foldLeft(0.0)(_ + _)))
    }
    scored.sortBy { case (id, _, s) => (-s, id) }.take(topK)
  }

  property("bm25TopK equals the in-memory reference bit-for-bit") =
    forAll(genCorpus, genTerms, Gen.chooseNum(1, 8)) { (texts, terms, k) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = CorpusOps.bm25TopK(docs, "doc_id", "text", terms, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq
      got == refBm25(texts, terms, k)
    }

  property("containmentPairs equals the naive shingle-set computation") =
    forAll(genCorpus, Gen.chooseNum(1, 4)) { (texts, tenths) =>
      import spark.implicits._
      val minC = tenths / 10.0
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "g") }
        .toDF("doc_id", "text", "grp")
      val got = graft.dedup.Dedup.containmentPairs(docs, "doc_id", "text",
          Seq("grp"), minContainment = minC)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)),
          (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
      def shingles(t: String): Set[String] = {
        val tk = t.split(" ").filter(_.nonEmpty)
        tk.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSet
      }
      val sets = texts.map(shingles).zipWithIndex
        .collect { case (s, i) if s.nonEmpty => i.toLong -> s }
      val want = (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        inter = (sa & sb).size.toLong if inter > 0
        ca = inter.toDouble / sa.size.toDouble
        cb = inter.toDouble / sb.size.toDouble
        if ca >= minC || cb >= minC
      } yield (ia, ib) -> ((inter, ca, cb))).toMap
      got == want
    }

  property("rrf equals the naive fusion, including single-list ids") =
    forAll(Gen.chooseNum(0, 6), Gen.chooseNum(0, 6),
      Gen.chooseNum(1, 10)) { (na, nb, k) =>
      import spark.implicits._
      // list A ranks ids 0..na-1; list B ranks ids offset by 3
      val a = (0 until na).map(i => (i.toLong, (i + 1).toLong))
      val b = (0 until nb).map(i => ((i + 3).toLong, (i + 1).toLong))
      val got = graft.operators.Fusion.rrf(
          a.toDF("id", "rank"), b.toDF("id", "rank"), "id", k)
        .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
      val ra = a.toMap
      val rb = b.toMap
      val want = (ra.keySet ++ rb.keySet).toSeq.map { id =>
        val s = ra.get(id).map(r => 1.0 / (60.0 + r.toDouble)).getOrElse(0.0) +
          rb.get(id).map(r => 1.0 / (60.0 + r.toDouble)).getOrElse(0.0)
        (id, s)
      }.sortBy { case (id, s) => (-s, id) }.take(k)
      got == want
    }
}
