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
      val conf = new SerializableConfiguration(org.apache.spark.sql
        .SparkSession.active.sessionState.newHadoopConf())
      new GtfsRtBatchWrite(path, info.queryId(), schema, conf)
    }
  }
}

final case class GtfsRtCommitMessage(files: Seq[String])
    extends WriterCommitMessage

final class GtfsRtBatchWrite(path: String, queryId: String,
                             schema: StructType,
                             conf: SerializableConfiguration)
    extends BatchWrite {
  private def tempDir = new Path(path, s"_temporary-$queryId")

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    GtfsRtWriterFactory(path, queryId, schema, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val target = new Path(path)
    val fs = target.getFileSystem(conf.value)
    fs.mkdirs(target)
    messages.foreach {
      case GtfsRtCommitMessage(files) => files.foreach { f =>
        val src = new Path(f)
        val dst = new Path(target, src.getName)
        if (!fs.rename(src, dst))
          throw new java.io.IOException(s"commit rename failed: $src -> $dst")
      }
      case other => throw new IllegalStateException(s"unexpected $other")
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
                                     conf: SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new GtfsRtDataWriter(path, queryId, schema, conf, partitionId, taskId)
}

/** Buffers this task's rows per feed_epoch, encodes each group as one
  * FeedMessage on commit. Feed snapshots are minutes of one agency's
  * updates — small by nature — so the per-task buffer is bounded by the
  * task's input split, the same memory shape as any columnar writer's
  * row group. */
final class GtfsRtDataWriter(path: String, queryId: String,
                             schema: StructType,
                             conf: SerializableConfiguration,
                             partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val idx = GtfsRtTable.Schema.fields.map(f =>
    f.name -> schema.fieldIndex(f.name)).toMap

  // epoch (None = headerless) -> rows in arrival order
  private val byEpoch =
    mutable.LinkedHashMap.empty[Option[Long], mutable.ArrayBuffer[RtRow]]

  override def write(row: InternalRow): Unit = {
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
      val name = f"part-$partitionId%05d-$taskId-" +
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
