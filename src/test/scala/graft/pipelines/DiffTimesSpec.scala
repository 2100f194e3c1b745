package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mart storage layout: date partitioning must actually prune. */
class DiffTimesSpec extends SparkSpec {

  test("refreshMart overwrites ONLY the updated date partitions; other " +
    "days' files are untouched") {
    import spark.implicits._
    def mart(rows: (String, String, Double)*) =
      rows.map { case (t, d, v) => (t, java.sql.Date.valueOf(d), v) }
        .toDF("trip_id", "start_date", "average_diff_in_minutes")
    val path = "target/test_mart_refresh"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    DiffTimes.writeMart(mart(
      ("t1", "2024-06-01", 1.0), ("t2", "2024-06-02", 2.0)), path)

    def files(day: String): Map[String, Long] = {
      val dir = new java.io.File(s"$path/start_date=$day")
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val d1Before = files("2024-06-01")

    DiffTimes.refreshMart(mart(("t3", "2024-06-02", 9.0)), path)

    // day 1 byte-untouched, day 2 replaced (not appended)
    assert(files("2024-06-01") === d1Before)
    val back = spark.read.parquet(path)
      .select(col("trip_id"), col("start_date").cast("string"),
        col("average_diff_in_minutes"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(back === Set(("t1", "2024-06-01", 1.0), ("t3", "2024-06-02", 9.0)))
  }

  test("writeMart partitions by start_date and day-sliced reads prune") {
    import spark.implicits._
    val mart = Seq(
      ("t1", java.sql.Date.valueOf("2024-06-01"), 1.5),
      ("t2", java.sql.Date.valueOf("2024-06-01"), 2.5),
      ("t3", java.sql.Date.valueOf("2024-06-02"), 3.5))
      .toDF("trip_id", "start_date", "average_diff_in_minutes")
    val path = "target/test_mart"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    DiffTimes.writeMart(mart, path)

    val sliced = spark.read.parquet(path)
      .where(col("start_date") === "2024-06-01")
    assert(sliced.count() === 2L)
    // the date predicate must land in PartitionFilters, not a post-scan
    // Filter — i.e. the 06-02 directory is never read
    val scan = sliced.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^\\]]*start_date[^\\]]*\\].*"), scan)
  }
}
