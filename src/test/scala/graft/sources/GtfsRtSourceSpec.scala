package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSpec
import graft.gtfs._

/** End-to-end coverage of the DataSourceV2 connector itself — RtSpec pins
  * the wire codec; this spec pins what the connector layers on top: split
  * planning vs maxPartitionBytes, column pruning through the Catalyst
  * read path, feed_epoch propagation, recursive listing, the corrupt-file
  * and empty-directory error paths, and option→Hadoop-conf propagation. */
class GtfsRtSourceSpec extends SparkSpec {

  private val Fmt = "graft.sources.GtfsRtSource"

  private def feed(tripId: String, epoch: Long, nStus: Int): Array[Byte] =
    Rt.encode(FeedMessage(
      header = FeedHeader("2.0", Some(epoch)),
      entity = Seq(FeedEntity("e1", None, Some(TripUpdate(
        trip = TripDescriptor(Some(tripId), Some("08:00:00"),
          Some("20240601"), Some("R1")),
        stopTimeUpdate = (1 to nStus).map(i =>
          StopTimeUpdate(Some(i), Some(StopTimeEvent(None,
            Some(epoch + 60L * i), None)), None, Some(i.toString))),
        timestamp = Some(epoch), delay = None))))))

  private def withDir(f: Path => Unit): Unit = {
    val dir = Files.createTempDirectory("gtfs-rt-src")
    try f(dir)
    finally {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles()).foreach(_.foreach(rm)); p.delete()
      }
      rm(dir.toFile)
    }
  }

  private def writeFeeds(dir: Path, n: Int): Unit =
    (1 to n).foreach { i =>
      Files.write(dir.resolve(f"snap_$i%03d.pb"), feed(s"T$i", 1717200000L + i, 3))
    }

  test("reads one row per stop_time_update with feed_epoch attached") {
    withDir { dir =>
      writeFeeds(dir, 4)
      val df = spark.read.format(Fmt).load(dir.toString)
      assert(df.count() === 12L) // 4 feeds x 3 STUs
      val epochs = df.select("feed_epoch").distinct().collect().map(_.getLong(0))
      assert(epochs.toSet === (1 to 4).map(1717200000L + _).toSet)
      // non-.pb clutter (checksums, manifests) is ignored, not decoded
      Files.write(dir.resolve("manifest.json"), "not a feed".getBytes)
      assert(spark.read.format(Fmt).load(dir.toString).count() === 12L)
    }
  }

  test("column pruning reaches the reader: a pruned scan reports only the " +
    "requested columns and still answers correctly") {
    withDir { dir =>
      writeFeeds(dir, 2)
      val pruned = spark.read.format(Fmt).load(dir.toString).select("trip_id")
      val scans = pruned.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.scan.asInstanceOf[GtfsRtScan]
      }
      assert(scans.map(_.readSchema().fieldNames.toSeq) === Seq(Seq("trip_id")))
      assert(pruned.distinct().collect().map(_.getString(0)).sorted
        === Array("T1", "T2"))
    }
  }

  test("split planning bin-packs whole files under maxPartitionBytes") {
    withDir { dir =>
      writeFeeds(dir, 8)
      val oneBytes = feed("T1", 1717200001L, 3).length.toLong
      def nParts(opts: Map[String, String]): Int =
        opts.foldLeft(spark.read.format(Fmt)) { case (r, (k, v)) =>
          r.option(k, v)
        }.load(dir.toString).rdd.getNumPartitions
      // cap below one file: every file is its own partition (a file never
      // splits); cap at three files: ceil(8/3) = 3 bins; huge cap: 1 bin
      assert(nParts(Map("maxPartitionBytes" -> "1")) === 8)
      assert(nParts(Map("maxPartitionBytes" -> (3 * oneBytes).toString)) === 3)
      assert(nParts(Map("maxPartitionBytes" -> "1000000000")) === 1)
    }
  }

  test("recursiveFileLookup=true walks a date-partitioned archive; the " +
    "default flat listing fails loudly on one") {
    withDir { dir =>
      val d1 = Files.createDirectories(dir.resolve("date=2024-06-01"))
      val d2 = Files.createDirectories(dir.resolve("date=2024-06-02"))
      Files.write(d1.resolve("a.pb"), feed("T1", 1717200001L, 2))
      Files.write(d2.resolve("b.pb"), feed("T2", 1717200002L, 2))
      val rec = spark.read.format(Fmt)
        .option("recursiveFileLookup", "true").load(dir.toString)
      assert(rec.count() === 4L)
      // flat listing sees zero .pb files -> clear failure naming the path,
      // not a silent empty DataFrame over a misaddressed archive
      val e = intercept[Exception] {
        spark.read.format(Fmt).load(dir.toString).count()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
      assert(messages(e).exists(m => m != null &&
        m.contains("no .pb files") && m.contains(dir.toString)))
      // ...unless the caller opts into reading an empty archive
      assert(spark.read.format(Fmt).option("allowEmpty", "true")
        .load(dir.toString).count() === 0L)
    }
  }

  test("a corrupt snapshot fails with its file path attached, whatever " +
    "exception type escapes the decoder") {
    withDir { dir =>
      writeFeeds(dir, 2)
      // a length varint near Long.MaxValue: pre-hardening this escaped as
      // an index error rather than the codec's own parse failure
      val w = new Pb.Writer
      w.varint((2L << 3) | 2); w.varint(Long.MaxValue - 3)
      Files.write(dir.resolve("zz_corrupt.pb"), w.bytes ++ Array.fill(4)(1.toByte))
      val e = intercept[Exception] {
        spark.read.format(Fmt).load(dir.toString).count()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
      assert(messages(e).exists(m => m != null &&
        m.contains("corrupt GTFS-RT feed") && m.contains("zz_corrupt.pb")))
    }
  }

  test("streaming read tails the archive: each micro-batch carries exactly " +
    "the newly-arrived files, and a checkpoint restart resumes past them") {
    withDir { dir =>
      val ckpt = Files.createTempDirectory("gtfs-rt-ckpt").toString
      val out = Files.createTempDirectory("gtfs-rt-out").toString
      writeFeeds(dir, 2) // snap_001, snap_002 exist before the stream starts
      // a parquet sink, not memory: the memory sink refuses checkpoint
      // RECOVERY, and the restart leg is the point of this test
      def start() = spark.readStream.format(Fmt)
        .load(dir.toString)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      def sunkTrips(): Map[String, Int] =
        spark.read.schema(GtfsRtTable.Schema).parquet(out)
          .select("trip_id").collect().map(_.getString(0))
          .groupBy(identity).view.mapValues(_.length).toMap
      val q1 = start()
      try {
        q1.processAllAvailable()
        assert(sunkTrips() === Map("T1" -> 3, "T2" -> 3))
        // a new snapshot lands mid-stream -> the next batch picks up ONLY it
        Files.write(dir.resolve("snap_003.pb"), feed("T3", 1717200003L, 3))
        q1.processAllAvailable()
        assert(sunkTrips() === Map("T1" -> 3, "T2" -> 3, "T3" -> 3))
      } finally q1.stop()
      // restart from the checkpoint: the committed watermark skips all
      // three processed snapshots; only the post-restart arrival flows —
      // no re-read, no duplicates in the sink
      Files.write(dir.resolve("snap_004.pb"), feed("T4", 1717200004L, 2))
      val q2 = start()
      try {
        q2.processAllAvailable()
        assert(sunkTrips()
          === Map("T1" -> 3, "T2" -> 3, "T3" -> 3, "T4" -> 2))
      } finally q2.stop()
    }
  }

  test("streaming watermark contract is DETECTED, not silently violated: " +
    "a file strictly newer than the committed watermark that sorts at or " +
    "below maxPath fails latestOffset with the monotone-naming contract " +
    "named; monotone arrivals advance both offset legs") {
    withDir { dir =>
      spark.sparkContext // listFeedFiles builds its conf off the session
      writeFeeds(dir, 2) // snap_001, snap_002
      val scan = new GtfsRtScan(dir.toString, GtfsRtTable.Schema,
        maxBytesOpt = None, recursive = false, allowEmpty = true,
        options = Map.empty)
      val stream = new GtfsRtMicroBatchStream(scan)
      val o0 = stream.initialOffset().asInstanceOf[GtfsRtOffset]
      val o1 = stream.latestFrom(o0)
      assert(o1.maxPath.endsWith("snap_002.pb") && o1.maxMod > 0L)
      // monotone arrival: advances cleanly
      Thread.sleep(5)
      Files.write(dir.resolve("snap_003.pb"), feed("T3", 1717200003L, 1))
      val o2 = stream.latestFrom(o1)
      assert(o2.maxPath.endsWith("snap_003.pb"))
      assert(o2.maxMod >= o1.maxMod)
      // NON-monotone arrival: strictly newer modtime, sorts below the
      // watermark — the batch-commit naming shape — must fail loudly
      Thread.sleep(5)
      val late = dir.resolve("snap_000_late.pb")
      Files.write(late, feed("LATE", 1717200000L, 1))
      late.toFile.setLastModified(System.currentTimeMillis() + 60000)
      val ex = intercept[IllegalStateException](stream.latestFrom(o2))
      assert(ex.getMessage.contains("monotone"), ex.getMessage)
      assert(ex.getMessage.contains("snap_000_late.pb"), ex.getMessage)
      // a pre-r10 checkpoint (maxMod = 0) never fails spuriously
      assert(stream.latestFrom(GtfsRtOffset(o2.maxPath, 0L))
        .maxPath == o2.maxPath)
      // the WATERMARK FILE's own mtime bumping is NOT a violation — a
      // non-atomic producer's newest file listed mid-write gets its
      // close-time mtime after the offset commits, and flagging that
      // would wedge the stream forever (the detection is strictly-below)
      Files.delete(late)
      dir.resolve("snap_003.pb").toFile
        .setLastModified(System.currentTimeMillis() + 120000)
      assert(stream.latestFrom(o2).maxPath.endsWith("snap_003.pb"))
      // and strictArrivalCheck=false is the operator's recovery hatch:
      // same torn state, detection off, the stream proceeds
      Files.write(late, feed("LATE", 1717200000L, 1))
      late.toFile.setLastModified(System.currentTimeMillis() + 60000)
      val lax = new GtfsRtMicroBatchStream(new GtfsRtScan(dir.toString,
        GtfsRtTable.Schema, maxBytesOpt = None, recursive = false,
        allowEmpty = true, options = Map("strictArrivalCheck" -> "false")))
      assert(lax.latestFrom(o2).maxPath.endsWith("snap_003.pb"))
    }
  }

  test("a stale commit manifest (file deleted out from under it) fails " +
    "with the manifest named and the fix stated, not a bare " +
    "FileNotFoundException; abort after a failed manifest publish " +
    "removes the orphaned hidden data dir") {
    withDir { dst =>
      spark.sparkContext
      writeFeeds(dst, 1)
      val qid = "stalecafe"
      val dataDir = dst.resolve(s"_data-$qid")
      Files.createDirectories(dataDir)
      Files.write(dst.resolve(s"commit-$qid.manifest"),
        s"_data-$qid/part-gone-1717200001.pb\n".getBytes("UTF-8"))
      val ex = intercept[java.io.FileNotFoundException](
        spark.read.format(Fmt).load(dst.toString).count())
      assert(ex.getMessage.contains(s"commit-$qid.manifest"), ex.getMessage)
      assert(ex.getMessage.contains("stale"), ex.getMessage)
      Files.delete(dst.resolve(s"commit-$qid.manifest"))
      // orphan cleanup: a commit that died between the data-dir rename
      // and the manifest publish leaves _data-<qid> with no manifest;
      // abort() must remove it (and the temp manifest), and must NOT
      // touch a data dir whose manifest exists (that commit succeeded)
      val conf = new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf())
      Files.write(dataDir.resolve("part-x-1717200002.pb"),
        feed("ORPHAN", 1717200002L, 1))
      Files.write(dst.resolve(s"_manifest-tmp-$qid"),
        "x\n".getBytes("UTF-8"))
      new GtfsRtBatchWrite(dst.toString, qid,
        GtfsRtTable.Schema, conf, 1000L).abort(Array.empty)
      assert(!Files.exists(dataDir))
      assert(!Files.exists(dst.resolve(s"_manifest-tmp-$qid")))
      val okQid = "okcommit1"
      val okData = dst.resolve(s"_data-$okQid")
      Files.createDirectories(okData)
      Files.write(okData.resolve("part-y-1717200003.pb"),
        feed("KEPT", 1717200003L, 1))
      Files.write(dst.resolve(s"commit-$okQid.manifest"),
        s"_data-$okQid/part-y-1717200003.pb\n".getBytes("UTF-8"))
      new GtfsRtBatchWrite(dst.toString, okQid,
        GtfsRtTable.Schema, conf, 1000L).abort(Array.empty)
      assert(Files.exists(okData), "abort must not touch a published commit")
      assert(spark.read.format(Fmt).load(dst.toString)
        .filter("trip_id = 'KEPT'").count() === 1L)
    }
  }

  test("write path: a flattened-row DataFrame writes protobuf snapshots " +
    "that read back row-identical (one file per feed_epoch per task); " +
    "the commit publishes ONE manifest over a hidden _data dir, no " +
    "_temporary tree survives") {
    withDir { src =>
      withDir { dst =>
        writeFeeds(src, 4)
        val in = spark.read.format(Fmt).load(src.toString)
        in.coalesce(1).write.format(Fmt).mode("append").save(dst.toString)
        // manifest-commit layout: root = 1 manifest + 1 hidden data dir
        // holding one snapshot per epoch (single task), no temp litter
        val rootEntries = Option(dst.toFile.listFiles()).get.map(_.getName)
        assert(rootEntries.count(_.matches("commit-[0-9a-zA-Z]+\\.manifest"))
          === 1, s"expected one commit manifest, got ${rootEntries.toSeq}")
        val dataDirs = rootEntries.filter(_.startsWith("_data-"))
        assert(dataDirs.length === 1, s"got ${rootEntries.toSeq}")
        val pbFiles = new java.io.File(dst.toFile, dataDirs.head)
          .listFiles().map(_.getName)
        assert(pbFiles.count(_.endsWith(".pb")) === 4,
          s"expected 4 snapshot files, got ${pbFiles.toSeq}")
        assert(!rootEntries.exists(_.startsWith("_temporary")),
          s"temp tree leaked: ${rootEntries.toSeq}")
        val back = spark.read.format(Fmt).load(dst.toString)
        val key = (df: org.apache.spark.sql.DataFrame) =>
          df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
            r.getString(3), Option(r.get(4)), Option(r.get(5)),
            r.getLong(6))).sortBy(_.toString).toSeq
        assert(key(back) === key(in))
      }
    }
  }

  test("write path: Spark's by-name output resolution pads a column-subset " +
    "input with nulls (nullable table schema), and the snapshot reads " +
    "back with those fields absent") {
    withDir { dst =>
      import spark.implicits._
      // Spark resolves the input against the table schema BY NAME and
      // fills missing nullable columns with null before the sink sees a
      // row — the sink's own missing-column require is a second line of
      // defense for direct (non-analyzed) invocations
      Seq(("T1", 7L)).toDF("trip_id", "stop_sequence")
        .write.format(Fmt).mode("append").save(dst.toString)
      val back = spark.read.format(Fmt).load(dst.toString).collect()
      assert(back.length === 1)
      val r = back.head
      assert(r.getString(0) === "T1" && r.getLong(2) === 7L)
      // absent wire strings read back as "" (the flatten convention);
      // absent events/header read back as real NULLs
      assert(r.getString(1) === "" && r.getString(3) === "",
        s"expected absent strings to flatten to empty, got $r")
      assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6),
        s"expected absent epochs/header null, got $r")
    }
  }

  test("feed_epoch filter pushdown prunes FILES by name-encoded epoch " +
    "when epochInFileName=true, stays row-correct, and never prunes " +
    "without the declared naming contract") {
    withDir { dir =>
      // epoch-named files, one per snapshot (the FetchLoop/writer
      // convention): snap-<epoch>.pb
      (1 to 6).foreach { i =>
        java.nio.file.Files.write(
          dir.resolve(s"snap-${1717200000L + i}.pb"),
          feed(s"T$i", 1717200000L + i, 2))
      }
      def read(opts: Map[String, String]) =
        opts.foldLeft(spark.read.format(Fmt)
            .option("maxPartitionBytes", "1")) { case (r, (k, v)) =>
          r.option(k, v)
        }.load(dir.toString)
          .filter(org.apache.spark.sql.functions.col("feed_epoch") >=
            1717200005L)
      // contract declared: only the 2 in-range files are even planned
      val pruned = read(Map("epochInFileName" -> "true"))
      assert(pruned.rdd.getNumPartitions === 2,
        "expected listing-time file pruning to 2 files")
      assert(pruned.select("feed_epoch").distinct().collect()
        .map(_.getLong(0)).toSet ===
        Set(1717200005L, 1717200006L))
      // no contract: all 6 files planned, rows still filtered correctly
      val unpruned = read(Map.empty)
      assert(unpruned.rdd.getNumPartitions === 6,
        "must NOT prune files without epochInFileName=true")
      assert(unpruned.count() === 4L) // 2 snapshots x 2 STUs
    }
  }

  test("write path: a job that dies mid-write is reader-invisible — the " +
    "old archive reads back unchanged, no temp tree and no partial .pb " +
    "files survive the abort") {
    withDir { dst =>
      // the pre-existing archive a failed repair job must not disturb
      writeFeeds(dst, 2)
      val before = spark.read.format(Fmt).load(dst.toString)
        .collect().map(_.toString).sorted.toSeq
      val beforeFiles = dst.toFile.listFiles().map(_.getName).sorted.toSeq
      // 12 rows through a 1-task plan with a 5-row task ceiling: the
      // task throws MID-WRITE (after buffering rows), Spark aborts the
      // task and then the job, and BatchWrite.abort must leave the
      // target exactly as it was
      val in = spark.read.format(Fmt).load(dst.toString)
        .unionByName(spark.read.format(Fmt).load(dst.toString))
      val ex = intercept[Exception] {
        in.coalesce(1).write.format(Fmt)
          .option("maxBufferedRowsPerTask", "5")
          .mode("append").save(dst.toString)
      }
      assert(ex.getMessage != null)
      val afterFiles = dst.toFile.listFiles().map(_.getName).sorted.toSeq
      assert(afterFiles === beforeFiles,
        s"aborted job changed the archive: $beforeFiles -> $afterFiles")
      val after = spark.read.format(Fmt).load(dst.toString)
        .collect().map(_.toString).sorted.toSeq
      assert(after === before)
    }
  }

  test("write path: two appends of the same data to one archive never " +
    "collide in commit — each lands under its own queryId-named manifest " +
    "and data dir, so the second append publishes beside the first") {
    withDir { src =>
      withDir { dst =>
        writeFeeds(src, 2)
        val in = spark.read.format(Fmt).load(src.toString)
        in.coalesce(1).write.format(Fmt).mode("append").save(dst.toString)
        in.coalesce(1).write.format(Fmt).mode("append").save(dst.toString)
        val rootEntries = dst.toFile.listFiles().map(_.getName)
        assert(rootEntries
          .count(_.matches("commit-[0-9a-zA-Z]+\\.manifest")) === 2,
          s"expected two commit manifests: ${rootEntries.toSeq}")
        val pbFiles = rootEntries.filter(_.startsWith("_data-"))
          .flatMap(d => new java.io.File(dst.toFile, d).listFiles())
          .map(_.getName).filter(_.endsWith(".pb"))
        assert(pbFiles.length === 4, s"expected 2+2 snapshots: ${pbFiles.toSeq}")
        assert(pbFiles.distinct.length === 4)
        // both copies read back: 2 epochs x 2 files x 3 STUs
        assert(spark.read.format(Fmt).load(dst.toString).count() === 12L)
      }
    }
  }

  test("write path: commit atomicity is the single manifest publish — a " +
    "crash BEFORE it (staged hidden data dir, temp tree, temp manifest) " +
    "leaves zero new rows visible in batch and recursive reads, and the " +
    "manifest alone flips the whole commit visible (VERDICT r9 item 5)") {
    withDir { dst =>
      writeFeeds(dst, 2) // the pre-existing archive: 2 x 3 = 6 rows
      assert(spark.read.format(Fmt).load(dst.toString).count() === 6L)
      // reconstruct the exact on-disk states of a commit that died after
      // the data-dir rename but before the manifest publish
      val qid = "deadbeef"
      val dataDir = dst.resolve(s"_data-$qid")
      Files.createDirectories(dataDir)
      Files.write(dataDir.resolve(s"part-00000-0-$qid-1717200099.pb"),
        feed("TORN", 1717200099L, 3))
      // plus an in-flight task tree and a half-written temp manifest
      val tmpTree = dst.resolve("_temporary-someotherquery")
      Files.createDirectories(tmpTree)
      Files.write(tmpTree.resolve("part-00000-0-xyz-1717200098.pb"),
        feed("INFLIGHT", 1717200098L, 3))
      Files.write(dst.resolve(s"_manifest-tmp-$qid"),
        s"_data-$qid/part-00000-0-$qid-1717200099.pb\n".getBytes("UTF-8"))
      // none of it is reader-visible, plain or recursive
      assert(spark.read.format(Fmt).load(dst.toString).count() === 6L)
      assert(spark.read.format(Fmt)
        .option("recursiveFileLookup", "true")
        .load(dst.toString).count() === 6L)
      // the one rename that commits: temp manifest -> manifest
      Files.move(dst.resolve(s"_manifest-tmp-$qid"),
        dst.resolve(s"commit-$qid.manifest"))
      val after = spark.read.format(Fmt).load(dst.toString)
      assert(after.count() === 9L)
      assert(after.filter("trip_id = 'TORN'").count() === 3L)
      // orphans in a data dir that the manifest does NOT list stay
      // invisible (speculative task duplicates)
      Files.write(dataDir.resolve(s"part-00001-9-$qid-1717200097.pb"),
        feed("ORPHAN", 1717200097L, 3))
      assert(spark.read.format(Fmt).load(dst.toString)
        .filter("trip_id = 'ORPHAN'").count() === 0L)
    }
  }

  test("reader options are folded into the Hadoop conf shipped to executors") {
    withDir { dir =>
      writeFeeds(dir, 1)
      val df = spark.read.format(Fmt)
        .option("graft.test.fs.key", "propagated").load(dir.toString)
      val factories = df.queryExecution.executedPlan.collect {
        case b: BatchScanExec =>
          b.scan.toBatch.createReaderFactory().asInstanceOf[GtfsRtReaderFactory]
      }
      assert(factories.map(_.conf.value.get("graft.test.fs.key")) ===
        Seq("propagated"))
    }
  }
}
