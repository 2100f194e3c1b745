package graft.text

import graft.SparkSpec
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the corpus operators over random
  * small-vocabulary documents. */
object CorpusOpsProps extends Properties("CorpusOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.session

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
  private val genDoc: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
  private val genCorpus: Gen[List[String]] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, genDoc))

  property("chunking with stride = chunkSize partitions the token stream " +
    "exactly: concatenated chunks rebuild every document") =
    forAll(genCorpus, Gen.chooseNum(1, 7)) { (texts, k) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val chunks = CorpusOps.chunkDocuments(docs, "doc_id", "text",
          chunkSize = k, stride = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      val rebuilt = chunks.groupBy(_._1).map { case (id, cs) =>
        id -> cs.sortBy(_._2).map(_._3).mkString(" ") }
      val want = texts.zipWithIndex.collect {
        case (t, i) if t.split(" ").exists(_.nonEmpty) =>
          i.toLong -> t.split(" ").filter(_.nonEmpty).mkString(" ")
      }.toMap
      rebuilt == want
    }

  property("decontaminate partitions the train set: kept docs share no " +
    "n-gram with eval, dropped docs share at least one") =
    forAll(genCorpus, genCorpus, Gen.chooseNum(1, 3)) { (trainT, evalT, n) =>
      import spark.implicits._
      val train = trainT.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val eval = evalT.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("doc_id", "text")
      val keptIds = CorpusOps.decontaminate(train, eval, "doc_id", "text", n)
        .collect().map(_.getLong(0)).toSet
      def grams(s: String): Set[String] = {
        val tk = s.split(" ").filter(_.nonEmpty)
        tk.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
      }
      val evalGrams = evalT.flatMap(grams).toSet
      trainT.zipWithIndex.forall { case (t, i) =>
        val contaminated = grams(t).exists(evalGrams.contains)
        keptIds.contains(i.toLong) == !contaminated
      }
    }
}
