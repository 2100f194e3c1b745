package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The MinHash merge property and its aggregation shape. */
class GroupMinhashSpec extends SparkSpec {

  test("slot-wise min of member signatures equals the signature of the " +
    "pooled shingle union") {
    import spark.implicits._
    val docs = Seq(
      (1L, "g", "a b c d"), (2L, "g", "c d e f"), (3L, "g", "x y z w"))
      .toDF("doc_id", "grp", "text")
    val merged = Dedup.groupPolyMinhash(docs, "text", Seq("grp"), 16)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // NOTE: pooling via concatenated TEXT would create spurious bridge
    // bigrams ("d x", "x c"), so the union is built as the exact shingle set
    val shingles = Seq("a b","b c","c d","d e","e f","x y","y z","z w")
    val sigOfUnion = spark.createDataFrame(Seq(Tuple1(shingles)))
      .toDF("sh")
      .select(posexplode(Dedup.polyMinhashSignature(col("sh"), 16)))
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    assert(merged === sigOfUnion)
  }

  test("the group aggregation partial-aggregates map-side (min is merged " +
    "below the shuffle)") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, s"g${i % 3}", "a b c d"))
      .toDF("doc_id", "grp", "text")
    val df = Dedup.groupPolyMinhash(docs, "text", Seq("grp"), 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"),
      s"no map-side partial min before the shuffle:\n$plan")
  }
}
