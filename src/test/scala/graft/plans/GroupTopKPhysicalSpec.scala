package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The whole-operator physical path: GroupTopKExec plans under the
  * injected strategy, survives EnsureRequirements with one exchange +
  * one sort, and is value-identical to Rank.groupTopK. */
class GroupTopKPhysicalSpec extends SparkSpec {

  private lazy val session = {
    val s = spark.newSession()
    GraftOptimizations.install(s)
    s
  }

  private def df = {
    import session.implicits._
    (1L to 500L).map(i => (s"g${i % 7}", (i * 37) % 101, i))
      .toDF("grp", "score", "id")
  }

  test("plans a GroupTopKExec node (not a window or aggregate)") {
    val out = GroupTopKPlan.topK(df, Seq("grp"),
      Seq("score" -> false, "id" -> true), k = 3)
    val physical = out.queryExecution.executedPlan.toString
    assert(physical.contains("GroupTopK"),
      s"expected GroupTopK in:\n$physical")
    assert(!physical.contains("Window"))
  }

  test("matches Rank.groupTopK row-for-row on a multi-partition input, " +
    "any input partitioning") {
    for (parts <- Seq(1, 7)) {
      val in = df.repartition(parts, col("id"))
      val got = GroupTopKPlan.topK(in, Seq("grp"),
          Seq("score" -> false, "id" -> true), k = 5)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      val expected = graft.operators.Rank.groupTopK(in, Seq("grp"),
          Seq(col("score").desc, col("id").asc), k = 5)
        .drop("rank")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got === expected, s"parts=$parts")
    }
  }

  test("k >= group size returns whole groups; output rows per group " +
    "never exceed k") {
    val out = GroupTopKPlan.topK(df, Seq("grp"),
        Seq("score" -> false, "id" -> true), k = 1000)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = df.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === sizes)
    val capped = GroupTopKPlan.topK(df, Seq("grp"),
        Seq("score" -> false, "id" -> true), k = 2)
      .groupBy("grp").count().collect().map(_.getLong(1))
    assert(capped.forall(_ <= 2L))
  }

  test("empty group list is rejected upstream shapes aside, k must be " +
    "positive") {
    intercept[IllegalArgumentException] {
      GroupTopKPlan.GroupTopK(Seq.empty, Seq.empty, 0,
        df.queryExecution.analyzed)
    }
  }

  test("floating-point group keys are rejected (byte-wise key equality " +
    "would split -0.0 from 0.0)") {
    import session.implicits._
    val d = Seq((1.0d, 1L), (-0.0d, 2L)).toDF("g", "id")
    intercept[IllegalArgumentException] {
      GroupTopKPlan.topK(d, Seq("g"), Seq("id" -> true), k = 1)
    }
  }
}
