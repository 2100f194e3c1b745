package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the native TypedImperativeAggregate CMS against the relational
  * build (operators/CountMin.sketch): identical counters cell-for-cell,
  * independent of partitioning — the element-wise merge is what makes
  * the buffer a real mergeable sketch, and any drift here would also
  * break q199's shared-oracle hash check. */
class CmsSketchAggSpec extends SparkSpec {

  test("buffer equals the relational sketch cell-for-cell, any partitioning") {
    val s = spark
    import s.implicits._
    val (depth, width) = (3, 32)
    val keyed = (1 to 500)
      .map(i => (s"tok${i % 37}", (i % 5 + 1).toLong))
      .toDF("tok", "wt")
    val relational = graft.operators.CountMin
      .sketch(keyed, "tok", "wt", depth, width)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    for (parts <- Seq(1, 7)) {
      val arr = keyed.repartition(parts)
        .agg(CmsSketchAgg.cmsOf(col("tok"), col("wt"), depth, width)
          .as("sk"))
        .collect().head.getSeq[Long](0)
      assert(arr.length === depth * width)
      for (d <- 0 until depth; w <- 0 until width) {
        val expected = relational.getOrElse((d.toLong, w.toLong), 0L)
        assert(arr(d * width + w) === expected,
          s"cell ($d,$w) drifted at parts=$parts")
      }
    }
  }

  test("null keys are skipped; null weights contribute zero") {
    val s = spark
    import s.implicits._
    val keyed = Seq((Some("a"), Some(3L)), (None, Some(9L)),
      (Some("a"), None)).toDF("tok", "wt")
    val arr = keyed
      .agg(CmsSketchAgg.cmsOf(col("tok"), col("wt"), 2, 8).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(arr.sum === 6L, s"expected only a's weight 3 in 2 rows: $arr")
  }
}
