package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The mergeable top-k aggregate: value identity with the in-memory
  * reference under heavy ties, k larger than groups, and the merge/reduce
  * determinism contract (any partitioning → same result). */
class TopKAggregateSpec extends SparkSpec {

  test("topK == in-memory (score DESC, id ASC) top-k, stable under any " +
    "partitioning, groups smaller than k included") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => (s"g${i % 5}", (i * 13 % 7).toDouble, i)) ++
      Seq(("tiny", 1.0, 9001L))
    for (nPart <- Seq(1, 3, 8)) {
      val df = rows.toDF("g", "score", "id").repartition(nPart)
      val got = df.groupBy("g")
        .agg(TopKAggregate.topK(4)(col("score"), col("id")).as("tops"))
        .select(col("g"), posexplode(col("tops")))
        .collect()
        .map(r => (r.getString(0), r.getInt(1),
          r.getStruct(2).getDouble(0), r.getStruct(2).getLong(1)))
        .toSet
      val want = rows.groupBy(_._1).flatMap { case (g, ms) =>
        ms.map(m => (m._2, m._3)).sortBy(m => (-m._1, m._2)).take(4)
          .zipWithIndex.map { case ((s, id), i) => (g, i, s, id) }
      }.toSet
      assert(got === want, s"nPart=$nPart")
    }
  }

  test("reduce ignores rows worse than a full buffer's cutoff; merge is " +
    "a bounded sorted-merge") {
    val agg = new TopKAggregate(2)
    val full = agg.reduce(agg.reduce(agg.zero, Scored(5.0, 1)), Scored(4.0, 2))
    assert(agg.reduce(full, Scored(3.0, 3)) === full) // below cutoff
    assert(agg.reduce(full, Scored(4.0, 9)) === full) // tie, larger id loses
    assert(agg.reduce(full, Scored(4.0, 0)) ===
      Seq(Scored(5.0, 1), Scored(4.0, 0))) // tie, smaller id wins
    assert(agg.merge(full, Seq(Scored(6.0, 7))) ===
      Seq(Scored(6.0, 7), Scored(5.0, 1)))
  }
}
