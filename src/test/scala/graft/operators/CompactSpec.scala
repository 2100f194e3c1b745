package graft.operators

import graft.SparkSpec

/** Compaction merges micro-batch litter without changing content, and
  * the promote rolls back if it cannot land. */
class CompactSpec extends SparkSpec {

  test("compactParquet merges many small files into few, preserving " +
    "rows exactly") {
    import spark.implicits._
    val base = java.nio.file.Paths.get("target", "test_compact")
    org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    val out = base.toString
    // simulate 20 micro-batch appends — 20+ tiny files
    (1 to 20).foreach { b =>
      Seq.tabulate(50)(i => (b.toLong, b * 1000L + i))
        .toDF("batch", "v").coalesce(1)
        .write.mode("append").parquet(out)
    }
    val beforeRows = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val (nBefore, nAfter) =
      Compact.compactParquet(spark, out, targetBytes = 1L << 20)
    assert(nBefore >= 20)
    assert(nAfter < nBefore / 4,
      s"compaction barely helped: $nBefore -> $nAfter")
    val afterRows = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(afterRows === beforeRows)
    // no staging/old litter left behind
    val names = new java.io.File("target").list().toSet
    assert(!names.contains("test_compact.compact") &&
      !names.contains("test_compact.old"))
  }
}
