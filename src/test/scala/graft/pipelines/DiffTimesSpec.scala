package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mart storage layout: date partitioning must actually prune. */
class DiffTimesSpec extends SparkSpec {

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
