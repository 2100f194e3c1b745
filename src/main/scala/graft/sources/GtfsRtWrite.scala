package graft.sources

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.gtfs._

/** DataSourceV2 WRITE path for [[GtfsRtSource]] — the connector's other
  * half: a DataFrame of flattened stop_time_update rows (the reader's
  * own schema) writes back out as GTFS-realtime protobuf snapshot
  * files, one `FeedMessage` per (task, feed_epoch). This is the archive
  * REPAIR / re-shard / synthetic-feed tool: read a feed directory,
  * filter or fix rows, write a clean archive the reader (and any other
  * GTFS-RT consumer) ingests again — round-trip parity is pinned in
  * GtfsRtSourceSpec.
  *
  * Snapshot reconstruction: rows group by `feed_epoch` (one output file
  * per epoch per task — the archive's own granularity), and within an
  * epoch by (trip_id, start_date) into one TripUpdate entity each, stop
  * updates in row arrival order. Null epochs group under a headerless
  * snapshot (timestamp absent), exactly what the reader yields for
  * such files; null strings write as ABSENT wire fields, which the
  * reader's flatten convention surfaces as "" (Spark itself pads a
  * column-subset input with nulls via by-name output resolution —
  * both contracts pinned in GtfsRtSourceSpec).
  *
  * Commit protocol (manifest, single visibility point — VERDICT r9
  * item 5): every task writes to `_temporary-<queryId>/` and reports
  * its files; `commit()` renames that whole directory ONCE to
  * `_data-<queryId>/` (underscore-hidden, so readers never list into
  * it), then publishes a `commit-<queryId>.manifest` at the target
  * root — one relative path per line, ONLY the committed tasks' files
  * (a speculative duplicate's orphan rides along in the data dir but
  * is never listed, hence never read) — via write-temp + one rename.
  * The manifest rename is the commit's entire visibility point: a
  * crash or failed rename ANYWHERE before it leaves zero new files
  * visible to the reader (the r9 per-file rename loop could tear —
  * some files renamed, then a failure — which the all-or-nothing
  * precheck narrowed but could not close). `abort()` deletes the temp
  * tree. Readers resolve manifests alongside bare `.pb` files, so
  * archives from external producers keep working (GtfsRtScan's
  * listing). Reader-visible atomicity under a mid-commit crash is
  * pinned in GtfsRtSourceSpec.
  */
final class GtfsRtWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val schema = info.schema()
      val required = GtfsRtTable.Schema.fields.map(_.name)
      val missing = required.filterNot(schema.fieldNames.contains)
      require(missing.isEmpty,
        s"graft.sources.GtfsRtSource write requires columns " +
          s"${required.mkString(", ")}; missing: ${missing.mkString(", ")}")
      val maxRows = Option(info.options.get("maxBufferedRowsPerTask"))
        .map(_.toLong).getOrElse(GtfsRtWrite.DefaultMaxBufferedRowsPerTask)
      require(maxRows > 0, s"maxBufferedRowsPerTask must be > 0, got $maxRows")
      val conf = new SerializableConfiguration(org.apache.spark.sql
        .SparkSession.active.sessionState.newHadoopConf())
      new GtfsRtBatchWrite(path, info.queryId(), schema, conf, maxRows)
    }
  }
}

object GtfsRtWrite {
  /** Per-task buffered-row ceiling (see [[GtfsRtDataWriter]]): snapshots
    * are minutes of one agency's updates, so a task holding more than
    * this many rows means the input wasn't split along feed boundaries
    * (or isn't feed data at all) — fail fast with a message naming the
    * fix instead of letting the buffer OOM the executor. ~10⁶ RtRows is
    * on the order of 100 MB; override per-write with the
    * `maxBufferedRowsPerTask` option. */
  val DefaultMaxBufferedRowsPerTask: Long = 1000000L

  /** Query-id fragment used in on-disk names (manifest + data dir must
    * agree with the reader's resolution, so the spelling lives here). */
  def sanitizeQueryId(queryId: String): String =
    queryId.replaceAll("[^0-9a-zA-Z]", "").take(16)

  def manifestName(sanitizedQid: String): String =
    s"commit-$sanitizedQid.manifest"

  /** The manifest-publish step — ONE reader-visible rename, preceded by
    * a hidden temp write + hsync (close() alone does not fsync on local
    * or HDFS filesystems; without the explicit hsync a machine crash
    * after the rename could surface a truncated manifest whose torn
    * last line then fails reads loudly until repaired). Extracted so
    * the connector's batch commit and the parquet compaction executor
    * ([[graft.operators.Compaction]]) share one spelling of the
    * crash-safety discipline. Callers must have ALREADY staged their
    * data under hidden (underscore-prefixed) paths: everything before
    * this rename must leave zero new files visible to readers. */
  def publishManifest(fs: org.apache.hadoop.fs.FileSystem, target: Path,
                      qid: String, relativePaths: Seq[String]): Unit = {
    val manifest = new Path(target, manifestName(qid))
    val tmpManifest = new Path(target, s"_manifest-tmp-$qid")
    val out = fs.create(tmpManifest, true)
    try {
      out.write(relativePaths.sorted.map(p => s"$p\n").mkString
        .getBytes("UTF-8"))
      try out.hsync()
      catch { case _: UnsupportedOperationException =>
        // stream isn't Syncable (some FS wrappers): crash-durability
        // reverts to the filesystem's own close semantics
      }
    } finally out.close()
    if (!fs.rename(tmpManifest, manifest)) {
      fs.delete(tmpManifest, false)
      throw new java.io.IOException(
        s"commit rename failed: $tmpManifest -> $manifest — no new " +
          "files are visible to readers (the data dir stays hidden)")
    }
  }
}

final case class GtfsRtCommitMessage(files: Seq[String])
    extends WriterCommitMessage

final class GtfsRtBatchWrite(path: String, queryId: String,
                             schema: StructType,
                             conf: SerializableConfiguration,
                             maxBufferedRows: Long)
    extends BatchWrite {
  private def tempDir = new Path(path, s"_temporary-$queryId")

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    GtfsRtWriterFactory(path, queryId, schema, conf, maxBufferedRows)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val target = new Path(path)
    val fs = target.getFileSystem(conf.value)
    fs.mkdirs(target)
    val committed = messages.flatMap {
      case GtfsRtCommitMessage(files) => files.map(f => new Path(f).getName)
      case other => throw new IllegalStateException(s"unexpected $other")
    }
    if (committed.isEmpty) { fs.delete(tempDir, true); return }
    val qid = GtfsRtWrite.sanitizeQueryId(queryId)
    val dataDir = new Path(target, s"_data-$qid")
    val manifest = new Path(target, GtfsRtWrite.manifestName(qid))
    // retry-of-a-committed-job guard: the manifest (or its data dir)
    // already existing means this queryId committed once — refuse
    // BEFORE touching anything rather than silently re-publishing
    if (fs.exists(manifest) || fs.exists(dataDir))
      throw new java.io.IOException(
        s"commit aborted: $manifest or $dataDir already exists — this " +
          "query id already committed to this archive")
    // one directory rename stages every task file out of the temp tree;
    // speculative-duplicate orphans ride along but are never listed in
    // the manifest, so readers never see them
    if (!fs.rename(tempDir, dataDir))
      throw new java.io.IOException(
        s"commit rename failed: $tempDir -> $dataDir")
    // the manifest publish is the ONE reader-visible step — the shared
    // [[GtfsRtWrite.publishManifest]] discipline (hidden temp + hsync +
    // single rename)
    GtfsRtWrite.publishManifest(fs, target, qid,
      committed.map(n => s"_data-$qid/$n").toSeq)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = tempDir.getFileSystem(conf.value)
    fs.delete(tempDir, true)
    // a commit that failed AFTER the tempDir->dataDir rename left the
    // staged (hidden, reader-invisible) data dir behind with nothing
    // referencing it; without this, gigabytes leak per failed publish.
    // Deleting is safe exactly when the manifest is absent — present
    // means the commit actually succeeded and abort was called for some
    // other task's failure path, so the published data must stand
    val qid = GtfsRtWrite.sanitizeQueryId(queryId)
    val target = new Path(path)
    val manifest = new Path(target, GtfsRtWrite.manifestName(qid))
    val dataDir = new Path(target, s"_data-$qid")
    if (!fs.exists(manifest)) fs.delete(dataDir, true)
    fs.delete(new Path(target, s"_manifest-tmp-$qid"), false)
  }
}

final case class GtfsRtWriterFactory(path: String, queryId: String,
                                     schema: StructType,
                                     conf: SerializableConfiguration,
                                     maxBufferedRows: Long)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new GtfsRtDataWriter(path, queryId, schema, conf, partitionId, taskId,
      maxBufferedRows)
}

/** Buffers this task's rows per feed_epoch, encodes each group as one
  * FeedMessage on commit. Feed snapshots are minutes of one agency's
  * updates — small by nature — so the per-task buffer is bounded by the
  * task's input split, the same memory shape as any columnar writer's
  * row group; `maxBufferedRows` ENFORCES that assumption (an
  * epoch-skewed or mis-split input fails fast with the fix named,
  * instead of OOMing the executor mid-task). */
final class GtfsRtDataWriter(path: String, queryId: String,
                             schema: StructType,
                             conf: SerializableConfiguration,
                             partitionId: Int, taskId: Long,
                             maxBufferedRows: Long)
    extends DataWriter[InternalRow] {

  private val idx = GtfsRtTable.Schema.fields.map(f =>
    f.name -> schema.fieldIndex(f.name)).toMap

  // epoch (None = headerless) -> rows in arrival order
  private val byEpoch =
    mutable.LinkedHashMap.empty[Option[Long], mutable.ArrayBuffer[RtRow]]
  private var buffered = 0L

  override def write(row: InternalRow): Unit = {
    buffered += 1
    if (buffered > maxBufferedRows)
      throw new IllegalStateException(
        s"GtfsRtSource write task $taskId buffered more than " +
          s"$maxBufferedRows rows before its first commit; feed snapshots " +
          "should be far smaller. Repartition the input into more tasks " +
          "(e.g. repartition by feed_epoch) or raise the " +
          "maxBufferedRowsPerTask write option.")
    def str(name: String): String = {
      val i = idx(name)
      if (row.isNullAt(i)) null else row.getUTF8String(i).toString
    }
    def lng(name: String): Option[Long] = {
      val i = idx(name)
      if (row.isNullAt(i)) None else Some(row.getLong(i))
    }
    val epoch = lng("feed_epoch")
    byEpoch.getOrElseUpdate(epoch, mutable.ArrayBuffer.empty) += RtRow(
      trip_id = str("trip_id"), start_date = str("start_date"),
      stop_sequence = lng("stop_sequence").getOrElse(0L),
      stop_id = str("stop_id"),
      arrival_epoch = lng("arrival_epoch"),
      departure_epoch = lng("departure_epoch"))
  }

  private def toFeed(epoch: Option[Long], rows: Seq[RtRow]): FeedMessage = {
    val trips = mutable.LinkedHashMap
      .empty[(String, String), mutable.ArrayBuffer[RtRow]]
    rows.foreach(r =>
      trips.getOrElseUpdate((r.trip_id, r.start_date),
        mutable.ArrayBuffer.empty) += r)
    val entities = trips.zipWithIndex.map {
      case (((tripId, startDate), rs), i) =>
        FeedEntity(id = (i + 1).toString, isDeleted = None,
          tripUpdate = Some(TripUpdate(
            trip = TripDescriptor(Option(tripId), None, Option(startDate),
              None),
            stopTimeUpdate = rs.map(r => StopTimeUpdate(
              stopSequence = Some(r.stop_sequence.toInt),
              arrival = r.arrival_epoch.map(t =>
                StopTimeEvent(None, Some(t), None)),
              departure = r.departure_epoch.map(t =>
                StopTimeEvent(None, Some(t), None)),
              stopId = Option(r.stop_id))).toSeq,
            timestamp = None, delay = None)))
    }.toSeq
    FeedMessage(FeedHeader("2.0", epoch), entities)
  }

  override def commit(): WriterCommitMessage = {
    val temp = new Path(new Path(path), s"_temporary-$queryId")
    val fs = temp.getFileSystem(conf.value)
    fs.mkdirs(temp)
    val files = byEpoch.map { case (epoch, rows) =>
      // the queryId fragment makes the FINAL name unique across
      // applications: bare (partitionId, taskId) restart at 0 per app,
      // so two appends to one archive could otherwise collide in commit
      val name = f"part-$partitionId%05d-$taskId-" +
        s"${queryId.replaceAll("[^0-9a-zA-Z]", "").take(8)}-" +
        s"${epoch.map(_.toString).getOrElse("noepoch")}.pb"
      val out = new Path(temp, name)
      val stream = fs.create(out, true)
      try stream.write(Rt.encode(toFeed(epoch, rows.toSeq)))
      finally stream.close()
      out.toString
    }.toSeq
    GtfsRtCommitMessage(files)
  }

  override def abort(): Unit = ()
  override def close(): Unit = byEpoch.clear()
}
