package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.GtfsRtWrite

/** Small-file compaction (OPTIMIZE) — planner AND executor. The
  * reference has no lake-maintenance story (its system of record is
  * Postgres); any streaming-ingested parquet lake at 100 TB needs one:
  * a micro-batch writer lands a file per trigger, and a year of
  * minutes is half a million small files whose listing + footer reads
  * dominate scan time long before the data does.
  *
  * [[plan]] is the q136 arithmetic extracted to one spelling: files
  * (one metadata row each) pack SEQUENTIALLY in clustering-key order
  * into ~targetRows bins — sequential, not first-fit-decreasing,
  * because it PRESERVES the clustering key: each output file covers a
  * contiguous key range, so min/max pruning survives the rewrite.
  *
  * [[execute]] is the rewrite the plan intends, with the write-side
  * crash-safety the GTFS-RT connector established (VERDICT r11 item 3):
  * rows join their bin via a BROADCAST of the metadata-sized plan, ONE
  * shuffle keyed by (partition, bin) routes every bin to exactly one
  * task (so each bin becomes exactly one parquet file), files land in a
  * hidden `_temporary-<qid>/` tree, one rename stages them to
  * `_data-<qid>/`, and the [[GtfsRtWrite.publishManifest]] rename is
  * the single reader-visible commit point — a crash anywhere before it
  * leaves zero new files visible, and a re-run of a committed qid
  * refuses before touching anything. [[readCompacted]] resolves the
  * manifests exactly like the connector's reader resolves its own.
  *
  * Scale shape: the plan is file METADATA (one row per input file /
  * partition-day), the join is a broadcast, and the one data shuffle is
  * the rewrite itself — the minimum any compaction must move. Rows
  * within each output file are sorted by the clustering key, so
  * row-group min/max pruning survives inside files too. Byte identity
  * (every row survives, nothing added) and clustering preservation
  * (bin key ranges do not overlap within a partition) are pinned by
  * CompactionSpec; the plan→execute round-trip is hash-checked as
  * q241 against the q136 plan arithmetic recomputed by the oracle. */
object Compaction {

  /** Sequential bin assignment over per-(partition, clusterKey) file
    * metadata (`files`: partCol, orderCol, n_rows): bin = pre-file
    * cumulative row count DIV targetRows, per partition in clustering
    * order — q136's planner, shared by the q136 readout and
    * [[execute]] so the two can never pack apart. */
  def plan(files: DataFrame, partCol: String, orderCol: String,
           targetRows: Long): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val w = Window.partitionBy(col(partCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    files
      .withColumn("__cum", sum(col("n_rows")).over(w))
      .withColumn("bin", expr(s"(__cum - n_rows) DIV ${targetRows}L"))
      .drop("__cum")
  }

  /** Execute the compaction: rewrite `data` into one parquet file per
    * (partCol, bin) under `outDir/_data-<qid>/`, committed via the
    * connector's manifest protocol. `data` must carry `partCol` and
    * `orderCol` columns; every other column rides along unchanged. */
  def execute(data: DataFrame, partCol: String, orderCol: String,
              targetRows: Long, outDir: String, runId: String): Unit = {
    val spark = data.sparkSession
    val qid = GtfsRtWrite.sanitizeQueryId(runId)
    val target = new Path(outDir)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(target)
    val dataDir = new Path(target, s"_data-$qid")
    val manifest = new Path(target, GtfsRtWrite.manifestName(qid))
    // retry-of-a-committed-run guard (the GtfsRtBatchWrite.commit rule):
    // refuse BEFORE touching anything rather than silently re-publishing
    if (fs.exists(manifest) || fs.exists(dataDir))
      throw new java.io.IOException(
        s"compaction aborted: $manifest or $dataDir already exists — " +
          "this run id already committed to this directory")
    val files = data.groupBy(col(partCol), col(orderCol))
      .agg(count(lit(1)).as("n_rows"))
    val binPlan = plan(files, partCol, orderCol, targetRows)
      .select(col(partCol), col(orderCol), col("bin"))
    val tmp = new Path(target, s"_temporary-$qid")
    fs.delete(tmp, true)
    data
      // metadata-sized plan: broadcast, never a data-data shuffle join
      .join(broadcast(binPlan), Seq(partCol, orderCol))
      // ONE task per (partition, bin) → exactly one file per bin; the
      // within-task sort keeps row groups clustered on the key so
      // row-group min/max pruning survives inside each file too
      .repartition(col(partCol), col("bin"))
      .sortWithinPartitions(col(partCol), col("bin"), col(orderCol))
      .write.partitionBy(partCol, "bin").mode("overwrite")
      .parquet(tmp.toString)
    // one directory rename stages every file out of the temp tree
    if (!fs.rename(tmp, dataDir))
      throw new java.io.IOException(s"commit rename failed: $tmp -> $dataDir")
    val prefix = fs.makeQualified(target).toString + "/"
    val rel = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(dataDir, true)
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet"))
        rel += fs.makeQualified(f).toString.stripPrefix(prefix)
    }
    GtfsRtWrite.publishManifest(fs, target, qid, rel.toSeq)
  }

  /** Read a compacted directory through its commit manifests — ONLY
    * manifest-listed files are read (a crashed run's orphans stay
    * invisible, the connector-reader contract); the hidden data dir is
    * each read's basePath so the (partCol, bin) directory encoding
    * comes back as columns. */
  def readCompacted(spark: SparkSession, outDir: String): DataFrame = {
    val target = new Path(outDir)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val manifests = fs.listStatus(target).map(_.getPath.getName)
      .filter(n => n.startsWith("commit-") && n.endsWith(".manifest"))
      .sorted
    require(manifests.nonEmpty, s"no commit manifest under $outDir")
    manifests.map { m =>
      val in = fs.open(new Path(target, m))
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).toList
        finally in.close()
      require(lines.nonEmpty, s"empty manifest $m under $outDir")
      // every line is _data-<qid>/<part dirs>/<file>; the shared data
      // dir is the basePath that turns the dir encoding into columns
      val dataDirName = lines.head.takeWhile(_ != '/')
      val basePath = new Path(target, dataDirName).toString
      spark.read.option("basePath", basePath)
        .parquet(lines.map(l => new Path(target, l).toString): _*)
    }.reduce(_ unionByName _)
  }
}
