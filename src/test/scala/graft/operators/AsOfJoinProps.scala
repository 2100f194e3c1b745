package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Algebraic pins for the as-of join that example tables cannot cover:
  * time-reversal duality (forward on negated times IS backward) and
  * naive-reference agreement on generated timelines. */
object AsOfJoinProps extends Properties("AsOfJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session

  private val timeline = for {
    nl <- Gen.choose(1, 20)
    nr <- Gen.choose(0, 20)
    ls <- Gen.listOfN(nl, Gen.zip(Gen.oneOf("a", "b"), Gen.choose(-50L, 50L)))
    rs <- Gen.listOfN(nr, Gen.zip(Gen.oneOf("a", "b", "c"),
      Gen.choose(-50L, 50L)))
  } yield (ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) },
    // unique right rows per (key, time): the determinism precondition
    rs.distinctBy(r => (r._1, r._2)).zipWithIndex
      .map { case ((k, t), i) => (k, t, i.toDouble) })

  property("forward == backward under time negation; backward == naive " +
    "latest-at-or-before") = Prop.forAllNoShrink(timeline) { case (ls, rs) =>
    import spark.implicits._
    val left = ls.toDF("k", "lt", "lid")
    val right = rs.toDF("k", "rt", "rv")
    def rowsOf(df: org.apache.spark.sql.DataFrame, sign: Long) =
      df.collect().map { r =>
        (r.getString(0), sign * r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(v => sign * v.asInstanceOf[Long]))
      }.sortBy(t => (t._1, t._2, t._3)).toSeq
    val backward = rowsOf(
      AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt"), sign = 1L)
    // negate both time axes: earliest-at-or-after on (-t) is
    // latest-at-or-before on t
    val forwardNeg = rowsOf(
      AsOfJoin.asOf(
        left.withColumn("lt", -col("lt")),
        right.withColumn("rt", -col("rt")),
        Seq("k"), "lt", "rt", forward = true), sign = -1L)
    val naive = ls.map { case (k, lt, id) =>
      val cand = rs.filter(r => r._1 == k && r._2 <= lt)
      val best = if (cand.isEmpty) None else Some(cand.maxBy(_._2))
      (k, lt, id, best.map(_._3), best.map(_._2))
    }.sortBy(t => (t._1, t._2, t._3))
    Prop(backward == forwardNeg) :| "duality broke" &&
      Prop(backward == naive) :| "naive reference broke"
  }
}
