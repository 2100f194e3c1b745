package graft.streaming

import graft.operators.Upsert
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** §2.9 — the reference's realtime path as Structured Streaming. The
  * reference hand-rolls a micro-batch stream: cron fires every minute,
  * each run decodes the feed and upserts rows by the 4-column key
  * (reference/README.md:172-178, scripts/realtime_extractor.py:191-236).
  * Here the same semantics are a `writeStream.foreachBatch` running the
  * S9 set-oriented merge per micro-batch — the idiomatic mapping SURVEY.md
  * §2.9 prescribes. No watermark: the reference accepts arbitrarily late
  * updates (its upsert has no time bound), and state lives in the keyed
  * snapshot, not in stream memory.
  *
  * The snapshot is maintained parquet-without-ACID: merge into a `.next`
  * directory, then swap. With a table format (Delta/Iceberg) the body of
  * [[mergeBatch]] would collapse to a MERGE — the join shape is identical.
  */
object RealtimeStream {

  /** Resolve the readable snapshot for `targetPath`: the live directory,
    * or — when a crash hit [[promote]] between its two renames — the
    * `.old` directory that rename had just retired. Readers and the next
    * merge both recover through this, so the one-rename crash window
    * never loses the snapshot. */
  def snapshotPath(fs: FileSystem, targetPath: String): Option[Path] = {
    val tgt = new Path(targetPath)
    val old = new Path(targetPath + ".old")
    if (fs.exists(tgt)) Some(tgt)
    else if (fs.exists(old)) Some(old)
    else None
  }

  /** Crash-atomic promote of the `.next` snapshot: retire the live dir to
    * `.old` (one rename), then promote `.next` (one rename). There is no
    * instant with zero readable snapshots — a crash between the renames
    * leaves `.old`, which [[snapshotPath]] resolves; the previous
    * delete-then-rename shape had a window that lost the live copy. */
  private def promote(fs: FileSystem, targetPath: String): Unit = {
    val tgt = new Path(targetPath)
    val next = new Path(targetPath + ".next")
    val old = new Path(targetPath + ".old")
    // Hadoop rename reports failure by RETURNING false — require() it, or
    // a failed promote would silently leave the snapshot stale.
    if (fs.exists(tgt)) {
      fs.delete(old, true) // stale fallback from an earlier completed swap
      require(fs.rename(tgt, old), s"failed to retire $tgt to $old")
      require(fs.rename(next, tgt), s"failed to promote $next to $tgt")
    } else {
      // Recovering from a crash that hit between the renames above: `.old`
      // is the live snapshot (already merged into `.next`), so promote
      // first and only then drop the fallback — never delete the last
      // readable copy before its replacement is in place.
      require(fs.rename(next, tgt), s"failed to promote $next to $tgt")
      fs.delete(old, true)
    }
  }

  /** Compact the snapshot into ~`targetFileBytes` parquet files — the
    * small-files maintenance every continuously-merged parquet directory
    * needs (each micro-batch swap writes shuffle-partition-many files;
    * after days of one-minute ticks a naive reader opens thousands).
    * Rewrites through the same crash-atomic promote as the merges, so
    * compaction can race a crash without losing the snapshot. */
  def compactSnapshot(spark: SparkSession, targetPath: String,
                      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val fs = new Path(targetPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    snapshotPath(fs, targetPath).foreach { cur =>
      val bytes = fs.getContentSummary(cur).getLength
      val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
      // coalesce, not repartition: compaction only GLUES input splits —
      // a full shuffle of the snapshot buys nothing but network
      spark.read.parquet(cur.toString)
        .coalesce(nFiles.toInt)
        .write.mode("overwrite").parquet(targetPath + ".next")
      promote(fs, targetPath)
    }
  }

  /** One micro-batch: dedup the batch to latest-per-key, S9-merge it into
    * the snapshot at `targetPath`, atomically swap the new snapshot in. */
  def mergeBatch(batch: DataFrame, targetPath: String, keys: Seq[String],
                 compareCols: Seq[String], orderCol: String,
                 createdCol: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(targetPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val updates = Upsert.latestPerKey(batch, keys, orderCol)
    val merged = snapshotPath(fs, targetPath) match {
      case Some(cur) =>
        Upsert.upsert(spark.read.parquet(cur.toString), updates, keys,
          compareCols, createdCol)
      case None => updates
    }
    // Writing .next executes the plan (including the read of the current
    // snapshot) before the swap touches the live directory.
    merged.write.mode("overwrite").parquet(targetPath + ".next")
    promote(fs, targetPath)
  }

  /** One micro-batch of RAW FEED PAYLOADS: decode + flatten + enrich via
    * [[graft.pipelines.Realtime.microBatch]] against the current snapshot,
    * then swap — E1 end to end per batch. */
  def feedBatch(payloads: Dataset[Array[Byte]], targetPath: String,
                weatherJson: Option[String]): Unit = {
    implicit val spark: SparkSession = payloads.sparkSession
    val fs = new Path(targetPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val target = snapshotPath(fs, targetPath)
      .map(p => spark.read.parquet(p.toString))
    val merged = graft.pipelines.Realtime.microBatch(payloads, weatherJson, target)
    merged.write.mode("overwrite").parquet(targetPath + ".next")
    promote(fs, targetPath)
  }

  /** The reference's cron loop as an actual stream: watch a directory of
    * fetched `.pb` feed files (the S1 fetcher's drop zone — or any
    * binary-file landing path) and run E1 per micro-batch. `weatherJson`
    * is re-read per batch via the supplied thunk, matching the reference's
    * slowly-refreshed side input (SURVEY.md §2.9). */
  def startFeedStream(spark: SparkSession, feedDir: String,
                      targetPath: String, checkpointDir: String,
                      weatherJson: () => Option[String],
                      trigger: Trigger = Trigger.ProcessingTime("1 minute"))
      : StreamingQuery = {
    import spark.implicits._
    // streaming sources need the schema up front; this is binaryFile's
    // fixed schema
    val payloads = spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(feedDir)
    payloads.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        feedBatch(batch.select("content").as[Array[Byte]],
          targetPath, weatherJson())
      }
      .start()
  }

  /** Start the streaming upsert: every micro-batch of realtime rows is
    * merged into the keyed parquet snapshot. `stream` must be a streaming
    * DataFrame (e.g. rows decoded from fetched feeds). */
  def start(stream: DataFrame, targetPath: String, checkpointDir: String,
            keys: Seq[String], compareCols: Seq[String], orderCol: String,
            createdCol: Option[String] = None,
            trigger: Trigger = Trigger.ProcessingTime("1 minute"))
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch, targetPath, keys, compareCols, orderCol, createdCol)
      }
      .start()
}
