package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed global rank vs the single-partition reference, and the
  * no-global-window plan contract. */
class RankSpec extends SparkSpec {

  test("globalRank equals the naive global row_number on a total order, " +
    "including duplicate primary keys broken by the unique tiebreak") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1L to 5000L).map(i => (rnd.nextInt(50).toLong, i))
    val df = rows.toDF("k", "id").repartition(7) // scrambled input layout
    val want = rows.sortBy(t => (t._1, t._2)).zipWithIndex
      .map { case ((_, id), i) => id -> (i + 1L) }.toMap
    val got = Rank.globalRank(df, Seq(col("k"), col("id")))
      .select("id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("globalRank plans a RANGE repartition, not a single-task global " +
    "window sort") {
    import spark.implicits._
    val df = (1L to 100L).toDF("id")
    val plan = Rank.globalRank(df, Seq(col("id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"expected a range exchange in:\n$plan")
  }
}
