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

  test("globalRank keeps the data path distributed: multi-partition " +
    "output, no Window operator over the row stream (only the tiny " +
    "metadata prefix-sum), rank dense and complete") {
    import spark.implicits._
    // AQE legitimately coalesces this tiny fixture to one partition —
    // hold it off so the partition count reflects the operator's shape
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = scala.util.Try(spark.conf.get(key)).toOption
    try {
      spark.conf.set(key, "false")
      val out = Rank.globalRank((1L to 1000L).toDF("id"), Seq(col("id")))
      val ranks = out.select("rank").collect().map(_.getLong(0)).sorted
      assert(ranks.toSeq === (1L to 1000L)) // dense, no dup/missing ranks
      // a global-window spelling would collapse the stream to 1 partition
      assert(out.rdd.getNumPartitions > 1,
        s"single-partition data path (${out.rdd.getNumPartitions})")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("groupTopK equals the naive per-group window top-k on a " +
    "multi-partition frame (local prune loses nothing), including " +
    "groups smaller than k and ties broken by the explicit tiebreak") {
    import spark.implicits._
    val rows = (1L to 500L).map { i =>
      (s"g${i % 7}", i, (i * 37L) % 19L) // 7 groups, many score ties
    } ++ Seq(("tiny", 9001L, 5L)) // a 1-row group with k = 3
    val df = rows.toDF("g", "id", "score").repartition(8)
    val got = Rank.groupTopK(df, Seq("g"),
        Seq(col("score").desc, col("id").asc), k = 3, rankCol = "r")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    val want = rows.groupBy(_._1).flatMap { case (g, members) =>
      members.sortBy(m => (-m._3, m._2)).take(3)
        .zipWithIndex.map { case (m, i) => (g, m._2, i + 1L) }
    }.toSet
    assert(got === want)
  }
}
