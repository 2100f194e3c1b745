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
  * Commit protocol: every task writes to `_temporary-<queryId>/` and
  * reports its files; the driver MOVES them into the target directory
  * only in `commit()` (rename, per-file atomic on a real filesystem)
  * and deletes the temp tree on `abort()` — a killed job never leaves
  * half-written `.pb` files where the reader lists. Speculative
  * duplicate tasks write distinct temp names and only the committed
  * task's files are moved.
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
    val moves = messages.flatMap {
      case GtfsRtCommitMessage(files) => files.map { f =>
        val src = new Path(f)
        src -> new Path(target, src.getName)
      }
      case other => throw new IllegalStateException(s"unexpected $other")
    }
    // All-or-nothing guard BEFORE the first rename: task file names carry
    // a queryId fragment, so a collision here means a previous run's file
    // of the SAME query id (a retry of a committed job) or an outside
    // write — either way, renaming some files and then throwing midway
    // would leave a torn commit. Renames after a clean precheck can still
    // race a concurrent writer, but the failure then surfaces on the
    // rename itself rather than silently overwriting.
    val taken = moves.collect { case (_, dst) if fs.exists(dst) => dst }
    if (taken.nonEmpty)
      throw new java.io.IOException(
        s"commit aborted before any rename: destination files already " +
          s"exist: ${taken.mkString(", ")}")
    moves.foreach { case (src, dst) =>
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"commit rename failed: $src -> $dst")
    }
    fs.delete(tempDir, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = tempDir.getFileSystem(conf.value)
    fs.delete(tempDir, true)
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
