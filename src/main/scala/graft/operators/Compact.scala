package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance pass every streaming
  * sink eventually needs: micro-batch writers (the realtime snapshot
  * loop, any foreachBatch append) accrete files far below the ideal
  * scan unit, and at corpus scale the resulting file-listing and
  * per-file open costs dominate reads long before data volume does.
  *
  * Shape: read the directory, coalesce to ceil(bytes / targetBytes)
  * partitions — `coalesce`, NOT `repartition`: compaction must not pay
  * a shuffle, it only glues input splits together — and rewrite to a
  * staging dir, then atomically promote (rename live → old, staging →
  * live, drop old). Readers between the two renames see the directory
  * missing for the rename instant only; a crash mid-promote leaves
  * `.old` intact for manual recovery — the same promote discipline as
  * the realtime snapshot swap ([[graft.streaming.RealtimeStream]]). */
object Compact {

  /** Compact the parquet directory at `path` toward `targetBytes` per
    * output file. Returns (filesBefore, filesAfter). Row content is
    * preserved exactly (spec-pinned); intra-file order is whatever the
    * glued splits carry — parquet readers must not assume order. */
  def compactParquet(spark: SparkSession, path: String,
                     targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles(dir: Path) = fs.listStatus(dir)
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
    val before = dataFiles(p)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1L) / targetBytes)
      .min(before.length.toLong).toInt
    val staging = new Path(path + ".compact")
    fs.delete(staging, true)
    spark.read.parquet(path).coalesce(nOut)
      .write.mode("overwrite").parquet(staging.toString)
    val old = new Path(path + ".old")
    fs.delete(old, true)
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"compaction promote: cannot retire $p")
    if (!fs.rename(staging, p)) {
      fs.rename(old, p) // roll back — live data stays readable
      throw new java.io.IOException(s"compaction promote: cannot land $staging")
    }
    fs.delete(old, true)
    (before.length, dataFiles(p).length)
  }
}
