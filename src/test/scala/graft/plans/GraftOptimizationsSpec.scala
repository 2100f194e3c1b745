package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The HOF→IntDotProduct rewrite: fires on the canonical shape, leaves
  * non-matching aggregates alone, and never changes results. */
class GraftOptimizationsSpec extends SparkSpec {

  private val DOT =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"

  test("the canonical HOF dot product is rewritten to graft_int_dot " +
    "and produces identical results") {
    import spark.implicits._
    GraftOptimizations.install(spark)
    GraftOptimizations.install(spark) // idempotent
    assert(spark.experimental.extraOptimizations.count(
      _ == RewriteHofIntDot) === 1)

    // range (not a local Seq): a LocalRelation would be constant-folded
    // whole, leaving nothing to observe in the optimized plan
    val data = spark.range(2).select(
      array(col("id") + 1, col("id") + 2).as("a"),
      array(col("id") + 3, col("id") + 4).as("b"))
    val df = data.select(expr(DOT).as("dot"))
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_int_dot"),
      df.queryExecution.optimizedPlan.toString)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(11L, 23L))

    // the HOF spelling NULL-pads mismatched lengths → NULL; the rewrite
    // must preserve that (guarded kernel), not dot the common prefix
    val mismatched = spark.range(1).select(
      array(col("id") + 1, col("id") + 2).as("a"),
      array(col("id") + 3).as("b"))
    val m = mismatched.select(expr(DOT).as("dot"))
    assert(m.queryExecution.optimizedPlan.toString.contains("graft_int_dot"))
    assert(m.head().isNullAt(0))
  }

  test("non-dot aggregates are left untouched") {
    import spark.implicits._
    GraftOptimizations.install(spark)
    val data = Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
    // sum instead of product inside zip_with: must NOT rewrite
    val other = data.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x + y), 0L, (acc, v) -> acc + v)")
      .as("s"))
    assert(!other.queryExecution.optimizedPlan.toString.contains("graft_int_dot"))
    assert(other.head().getLong(0) === 10L)
  }

  test("the canonical HOF tokenization is rewritten to graft_tokens with " +
    "identical results, in both != and NOT(=) spellings and both operand " +
    "orders; near-miss shapes are left alone") {
    GraftOptimizations.install(spark)
    val data = spark.range(2).select(
      concat(lit("a  b "), col("id").cast("string")).as("text"))
    for (spelling <- Seq(
        "filter(split(text, ' '), t -> t != '')",
        "filter(split(text, ' '), t -> NOT (t = ''))",
        "filter(split(text, ' '), t -> '' != t)")) {
      val df = data.select(expr(spelling).as("tk"))
      assert(df.queryExecution.optimizedPlan.toString.contains("graft_tokens"),
        s"$spelling:\n${df.queryExecution.optimizedPlan}")
      assert(df.collect().map(_.getSeq[String](0)).toSeq ===
        Seq(Seq("a", "b", "0"), Seq("a", "b", "1")))
    }
    // near misses: a different separator, or a different predicate —
    // neither may rewrite (the kernel's semantics are space-split +
    // drop-empty ONLY)
    for (miss <- Seq(
        "filter(split(text, ','), t -> t != '')",
        "filter(split(text, ' '), t -> t != 'a')")) {
      val df = data.select(expr(miss).as("tk"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("graft_tokens"),
        s"$miss:\n${df.queryExecution.optimizedPlan}")
    }
  }
}
