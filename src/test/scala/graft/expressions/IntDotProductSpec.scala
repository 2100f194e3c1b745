package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native dot-product expression vs the built-in HOF spelling. */
class IntDotProductSpec extends SparkSpec {

  test("matches aggregate(zip_with(...)) on random vectors (interpreted + codegen)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val rows = Seq.fill(50)((
      Seq.fill(16)(rnd.nextInt(2000000).toLong - 1000000L),
      Seq.fill(16)(rnd.nextInt(2000000).toLong - 1000000L)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      IntDotProduct.intDot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), _ * _), lit(0L), _ + _).as("hof"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("NULL array yields NULL; empty arrays yield 0") {
    import spark.implicits._
    val df = Seq((Some(Seq(1L, 2L)), None: Option[Seq[Long]]),
      (Some(Seq.empty[Long]), Some(Seq.empty[Long]))).toDF("a", "b")
    val rows = df.select(IntDotProduct.intDot(col("a"), col("b"))).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getLong(0) === 0L)
  }

  test("participates in whole-stage codegen") {
    // range-derived input: a literal frame would be constant-folded into a
    // LocalTableScan with no codegen stage at all.
    val df = spark.range(4).select(
        transform(sequence(lit(0L), lit(3L)), i => i + col("id")).as("a"),
        transform(sequence(lit(0L), lit(3L)), i => i * 2L).as("b"))
      .select(col("a"), col("b"),
        IntDotProduct.intDot(col("a"), col("b")).as("d"))
    // If doGenCode were broken this would fall back to interpreted eval;
    // assert both the value and the codegen stage in the executed plan.
    val rows = df.collect()
    rows.foreach { r =>
      val a = r.getSeq[Long](0); val b = r.getSeq[Long](1)
      assert(r.getLong(2) === a.zip(b).map { case (x, y) => x * y }.sum)
    }
    // executedPlan.toString marks codegen stages with a "*(n)" prefix —
    // the project evaluating graft_int_dot must carry one.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_int_dot") && l.trim.startsWith("*")), plan)
  }
}
