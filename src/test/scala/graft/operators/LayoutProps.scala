package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Algebraic pins for the layout/join operators: the z-order quadtree-box
  * property (why min-max skipping works at all) and range-join
  * bucket-width independence (the width is a tuning knob, never a
  * correctness knob). */
object LayoutProps extends Properties("Layout") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session

  private val genPoints: Gen[List[(Long, Long)]] =
    Gen.chooseNum(2, 40).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 255L), Gen.choose(0L, 255L))))

  property("z-order quadtree boxes: two points share a z-prefix of 2j " +
    "bits IFF they share the j-high-bit box in BOTH dimensions") =
    Prop.forAllNoShrink(genPoints, Gen.choose(1, 7)) { (pts, j) =>
      import spark.implicits._
      val zs = pts.distinct.toDF("x", "y")
        .select(col("x"), col("y"),
          ZOrder.zValue(Seq(col("x"), col("y")), 8).as("z"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      val all = for (a <- zs; b <- zs) yield {
        val samePrefix = (a._2 >> (2 * j)) == (b._2 >> (2 * j))
        val sameBox = (a._1._1 >> j) == (b._1._1 >> j) &&
          (a._1._2 >> j) == (b._1._2 >> j)
        samePrefix == sameBox
      }
      Prop(all.forall(identity)) :| s"box property broke at j=$j"
    }

  private val genRange = for {
    pts <- Gen.chooseNum(5, 60).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.oneOf("a", "b"), Gen.choose(-30L, 30L))))
    ivs <- Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.oneOf("a", "b", "c")
      lo <- Gen.choose(-35L, 35L)
      w <- Gen.choose(-3L, 20L) // negative width = empty interval
    } yield (k, lo, lo + w)))
    width <- Gen.oneOf(1L, 2L, 7L, 64L, 1000L)
  } yield (pts.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) },
    ivs.zipWithIndex.map { case ((k, lo, hi), i) => (k, lo, hi, i.toLong) },
    width)

  property("pointInInterval matches the naive BETWEEN join for EVERY " +
    "bucket width — width tunes replication, never results") =
    Prop.forAllNoShrink(genRange) { case (pts, ivs, width) =>
      import spark.implicits._
      val got = RangeJoin.pointInInterval(
          pts.toDF("k", "t", "pid"), ivs.toDF("k", "lo", "hi", "iid"),
          Seq("k"), "t", "lo", "hi", width)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = (for {
        (pk, t, pid) <- pts
        (ik, lo, hi, iid) <- ivs
        if pk == ik && t >= lo && t <= hi
      } yield (pid, iid)).sorted
      Prop(got == want) :| s"width=$width diverged"
    }
}
