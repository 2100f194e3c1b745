package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Priority sampling: exact-integer parity with an in-memory reference,
  * determinism, and the bounded top-k plan. */
class PrioritySampleSpec extends SparkSpec {

  import spark.implicits._

  private def naive(rows: Seq[(Long, Long, Long)], k: Int): Seq[(Long, Long)] =
    // same Long math as the operator: (w*Scale)/(h+1), ties by id asc
    rows.map { case (id, w, h) => (id, (w * PrioritySample.Scale) / (h + 1)) }
      .sortBy { case (id, p) => (-p, id) }
      .take(k)

  test("matches the in-memory integer reference on a randomized corpus") {
    val rnd = new scala.util.Random(42L)
    for (_ <- 1 to 3) {
      val rows = (1L to 200L).map(id =>
        (id, 1L + rnd.nextInt(1000).toLong, rnd.nextInt(1 << 30).toLong))
      val df = rows.toDF("id", "w", "h")
      val got = PrioritySample.sample(df, 25, col("w"), col("h"), col("id"))
        .select("id", "priority").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.sortBy(t => (-t._2, t._1)) === naive(rows, 25))
    }
  }

  test("deterministic: two runs over a reshuffled input pick the same set") {
    val rows = (1L to 100L).map(id => (id, id % 7L + 1L, id * 2654435761L % (1L << 31)))
    val a = PrioritySample.sample(rows.toDF("id", "w", "h"), 10,
      col("w"), col("h"), col("id")).select("id").as[Long].collect().toSet
    val b = PrioritySample.sample(
      rows.reverse.toDF("id", "w", "h").repartition(7), 10,
      col("w"), col("h"), col("id")).select("id").as[Long].collect().toSet
    assert(a === b)
  }

  test("plan: bounded TakeOrderedAndProject, no global sort") {
    val df = (1L to 50L).map(i => (i, i, i)).toDF("id", "w", "h")
    val plan = PrioritySample.sample(df, 5, col("w"), col("h"), col("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("zero-weight rows get priority 0 and lose to any positive weight") {
    val df = Seq((1L, 0L, 5L), (2L, 1L, 1000000L)).toDF("id", "w", "h")
    val got = PrioritySample.sample(df, 1, col("w"), col("h"), col("id"))
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(2L))
  }
}
