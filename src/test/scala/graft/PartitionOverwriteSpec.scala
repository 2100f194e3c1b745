package graft

import org.apache.spark.sql.functions._

/** Dynamic partition overwrite is SURGICAL: only partitions present in
  * the incoming frame are replaced; every other partition's files are
  * untouched on disk (same paths, same bytes) — the q103 contract. */
class PartitionOverwriteSpec extends SparkSpec {

  private def listFiles(dir: java.io.File): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
  }

  test("rewriting one partition leaves every other partition's files " +
    "byte-identical, and static mode would have dropped them") {
    import spark.implicits._
    val out = new java.io.File("target/pow_spec")
    org.apache.commons.io.FileUtils.deleteQuietly(out)
    val ev = Seq(
      (1L, 5L, "click", 1.0), (2L, 6L, "click", 2.0),
      (3L, 5L, "view", 3.0), (4L, 7L, "purchase", 4.0))
      .toDF("event_id", "user_id", "event_type", "value")
    ev.write.mode("overwrite").partitionBy("event_type")
      .parquet(out.getPath)
    val before = listFiles(out)
    assert(before.keys.exists(_.contains("event_type=view")))

    // surgical rewrite of ONLY the click partition (user 5 erased)
    ev.where($"event_type" === "click" && $"user_id" =!= 5L)
      .write.mode("overwrite").partitionBy("event_type")
      .option("partitionOverwriteMode", "dynamic").parquet(out.getPath)
    val after = listFiles(out)

    val untouchedBefore = before.filter(!_._1.contains("event_type=click"))
    val untouchedAfter = after.filter(!_._1.contains("event_type=click"))
    assert(untouchedAfter === untouchedBefore,
      "non-click partition files were rewritten")

    val rows = spark.read.parquet(out.getPath)
      .select("event_id", "user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rows === Set((2L, 6L, "click"), (3L, 5L, "view"),
      (4L, 7L, "purchase")), s"unexpected table content: $rows")
  }
}
