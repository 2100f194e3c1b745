package graft.similarity

import graft.SparkSpec
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the ANN paths on generated CLUSTERED
  * embeddings (uniform random vectors have no cluster structure for IVF
  * to exploit; clustered ones are the workload the operator exists for).
  * Pins the scaladoc's recall/probe tradeoff claim: probing more inverted
  * lists can only widen the candidate set, so recall vs the exact
  * brute-force baseline is monotone in nProbe, and probing EVERY list is
  * exhaustive search — recall exactly 1. */
object SimilarityProps extends Properties("Similarity") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  private val dim = 8
  private val nCentroids = 8

  /** ~60 vectors in a handful of tight clusters: cluster centers from a
    * coarse integer lattice, members = center + small per-coordinate
    * jitter. */
  private val genClustered: Gen[List[(Long, Seq[Float])]] = for {
    nClusters <- Gen.chooseNum(3, 6)
    centers <- Gen.listOfN(nClusters,
      Gen.listOfN(dim, Gen.chooseNum(-5, 5).map(_.toFloat * 2f)))
    sizes <- Gen.listOfN(nClusters, Gen.chooseNum(6, 12))
    members <- Gen.sequence[List[List[List[Float]]], List[List[Float]]](
      centers.zip(sizes).map { case (c, n) =>
        Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-40, 40))
          .map(js => c.zip(js).map { case (x, j) => x + j / 100f }))
      })
  } yield members.flatten.zipWithIndex
    .map { case (v, i) => (i.toLong, v.toSeq) }

  property("ivfTopK recall vs bruteForceTopK is monotone in nProbe " +
    "(2 -> 4 -> 8) and EXACTLY 1 when every list is probed") =
    forAll(genClustered) { rows =>
      import spark.implicits._
      val corpus = rows.toDF("vec_id", "embedding")
      val queries = rows.take(5).toDF("vec_id", "embedding")
      def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("query_id", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = resultSet(Similarity.bruteForceTopK(
        queries, corpus, "vec_id", "embedding", k = 3))
      def recall(nProbe: Int): Double = {
        val got = resultSet(Similarity.ivfTopK(queries, corpus,
          "vec_id", "embedding", k = 3,
          nCentroids = nCentroids, nProbe = nProbe))
        got.count(exact.contains).toDouble / exact.size
      }
      val r2 = recall(2)
      val r4 = recall(4)
      val r8 = recall(nCentroids)
      r2 <= r4 && r4 <= r8 && r8 == 1.0
    }
}
