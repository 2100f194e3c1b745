package graft.dedup

import graft.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the dedup operators over random corpora from
  * a tiny vocabulary (collisions and near-dups happen constantly, unlike
  * random strings): the distributed formulations must agree with the
  * obvious quadratic in-memory reference computations. */
object DedupProps extends Properties("Dedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.session

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
  private val genDoc: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
  private val genCorpus: Gen[List[String]] =
    Gen.chooseNum(2, 12).flatMap(n => Gen.listOfN(n, genDoc))

  private def naiveShingles(s: String): Set[String] = {
    val tk = s.split(" ").filter(_.nonEmpty)
    tk.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
  }

  property("jaccardPairs (inverted index) == naive all-pairs, any corpus, " +
    "with and without the df cap") =
    forAll(genCorpus, Gen.option(Gen.chooseNum(1L, 6L))) { (texts, maxDf) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "b") }
        .toDF("doc_id", "text", "b")
      val got = Dedup.jaccardPairs(docs, "doc_id", "text", Seq("b"),
          minJaccard = 0.01, maxDf = maxDf)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val all = texts.zipWithIndex.map { case (t, i) => i.toLong -> t }
      val df = all.flatMap { case (_, t) => naiveShingles(t) }
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val reduced = all.map { case (id, t) =>
        id -> naiveShingles(t).filter(s => maxDf.forall(df(s) <= _)) }.toMap
      val want = (for {
        (ia, _) <- all; (ib, _) <- all if ia < ib
        sa = reduced(ia); sb = reduced(ib)
        inter = sa.intersect(sb).size if inter > 0
        j = inter.toDouble / sa.union(sb).size.toDouble
        if j >= 0.01
      } yield (ia, ib) -> j).toMap
      got == want
    }

  property("simhashPairs is COMPLETE for hamming <= 3 (4x16-bit " +
    "pigeonhole): every qualifying representative pair is returned") =
    forAll(genCorpus) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val fps = docs
        .select(col("doc_id"),
          Dedup.simhash64(TextAnalysis.tokens(col("text"))).as("fp"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      // representative per fingerprint (the operator collapses hamming-0)
      val reps = fps.groupBy(_._2).map { case (fp, g) =>
        g.map(_._1).min -> fp }.toSeq
      val want = (for {
        (ia, fa) <- reps; (ib, fb) <- reps if ia < ib
        h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
      } yield (math.min(ia, ib), math.max(ia, ib))).toSet
      val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      want.subsetOf(got) &&
        got.forall { case (a, b) => a < b } // and every returned pair is ordered
    }
}
