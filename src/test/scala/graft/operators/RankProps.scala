package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the bounded ranking operators: the
  * distributed formulations must agree with the obvious in-memory
  * reference on any frame, any k, any partitioning. */
object RankProps extends Properties("Rank") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session

  private val genRows: Gen[List[(String, Long, Long)]] =
    Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n,
      for {
        g <- Gen.oneOf("g1", "g2", "g3")
        score <- Gen.chooseNum(0L, 9L) // few values → constant ties
      } yield (g, score, 0L)))
      .map(_.zipWithIndex.map { case ((g, s, _), i) => (g, s, i.toLong) })

  property("groupTopK == in-memory per-group top-k under heavy ties, any " +
    "k, any input partitioning (the tiebreak makes the order total)") =
    forAll(genRows, Gen.chooseNum(1, 8), Gen.chooseNum(1, 6)) {
      (rows, k, nPart) =>
        import spark.implicits._
        val df = rows.toDF("g", "score", "id").repartition(nPart)
        val got = Rank.groupTopK(df, Seq("g"),
            Seq(col("score").desc, col("id").asc), k, rankCol = "r")
          .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
          .toSet
        val want = rows.groupBy(_._1).flatMap { case (g, members) =>
          members.sortBy(m => (-m._2, m._3)).take(k)
            .zipWithIndex.map { case (m, i) => (g, m._3, i + 1L) }
        }.toSet
        got == want
    }
}
