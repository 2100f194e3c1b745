package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.gtfs.{FeedMessage, Rt}

/** DataSourceV2 batch source for directories of GTFS-realtime protobuf
  * feed snapshots — the reference's ingestion input (one `FeedMessage`
  * file per fetch tick, reference/scripts/realtime_extractor.py:97-118)
  * surfaced as a first-class Spark table:
  *
  * {{{
  *   spark.read.format("graft.sources.GtfsRtSource").load("/feeds/2024-06-01")
  * }}}
  *
  * Each row is one flattened stop_time_update (the [[graft.gtfs.RtRow]]
  * shape) plus the snapshot-level `feed_epoch` (FeedHeader.timestamp) —
  * the file-scoped metadata a flatMap over pre-read bytes cannot carry
  * without manual plumbing.
  *
  * Why a connector rather than `spark.read.binaryFile` + flatMap (the q28
  * spelling): the connector owns SPLIT PLANNING and SCHEMA PRUNING.
  *
  *  - '''Scale shape''': a production feed archive is one small file per
  *    (agency, minute) — at 100 TB that is tens of millions of ~100 KB
  *    files. [[GtfsRtScan.planInputPartitions]] bin-packs files into
  *    input partitions up to `spark.sql.files.maxPartitionBytes` (the
  *    same knob the built-in file sources honor), so task count tracks
  *    data volume, not file count — no 10M-task stage, no per-file
  *    scheduling overhead, and executors stream file after file inside
  *    one task.
  *  - '''Column pruning''': the ScanBuilder implements
  *    [[SupportsPushDownRequiredColumns]]; Catalyst pushes the required
  *    schema into the reader, which materializes ONLY the requested
  *    fields (a pruned `trip_id` never becomes a UTF8String). The wire
  *    decode itself still walks every byte — protobuf is not columnar —
  *    but allocation tracks the projection.
  *
  * Decode errors surface with the file path attached: a corrupt snapshot
  * in a million-file scan must name itself, not fail as a bare offset.
  */
final class GtfsRtSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GtfsRtTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft.sources.GtfsRtSource requires a path: .load(<dir of .pb files>)")
    new GtfsRtTable(path)
  }
}

object GtfsRtTable {
  /** Flattened feed schema — RtRow + the snapshot header timestamp. */
  val Schema: StructType = StructType(Seq(
    StructField("trip_id", StringType, nullable = true),
    StructField("start_date", StringType, nullable = true),
    StructField("stop_sequence", LongType, nullable = true),
    StructField("stop_id", StringType, nullable = true),
    StructField("arrival_epoch", LongType, nullable = true),
    StructField("departure_epoch", LongType, nullable = true),
    StructField("feed_epoch", LongType, nullable = true)))
}

final class GtfsRtTable(path: String) extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"gtfs_rt(`$path`)"
  override def schema(): StructType = GtfsRtTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GtfsRtScanBuilder(path, options)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new GtfsRtWriteBuilder(path, info)
}

final class GtfsRtScanBuilder(path: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private var required: StructType = GtfsRtTable.Schema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** FILE pruning by `feed_epoch` — the connector's partition-pruning
    * analog. The archive convention (FetchLoop and [[GtfsRtWrite]]
    * both follow it) encodes the snapshot epoch as the trailing digit
    * run of the file name; a pushed `feed_epoch` range then skips
    * whole files at LISTING time, before a byte is read — on a
    * tens-of-millions-of-files archive this is the difference between
    * scanning a day and scanning the fleet's history. Opt-in via
    * `epochInFileName=true`: trailing digits in arbitrary archives may
    * be sequence numbers, and mispruning silently drops data, so the
    * caller must declare the naming contract. Every filter is ALSO
    * kept as a residual (we return them all from [[pushFilters]]), so
    * Spark re-evaluates row-level — pruning is purely an optimization
    * and rows from unparseable file names stay correct. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources._
    pushed = filters.filter {
      case EqualTo("feed_epoch", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("feed_epoch", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("feed_epoch", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("feed_epoch", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("feed_epoch", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    filters // all residual: pruning never substitutes for evaluation
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    pushed

  private def epochBounds: Option[(Long, Long)] = {
    import org.apache.spark.sql.sources._
    if (pushed.isEmpty) None
    else {
      var lo = Long.MinValue
      var hi = Long.MaxValue
      def num(v: Any): Long = v match {
        case l: java.lang.Long => l
        case i: java.lang.Integer => i.toLong
      }
      pushed.foreach {
        case EqualTo(_, v) => lo = lo.max(num(v)); hi = hi.min(num(v))
        case GreaterThan(_, v) => lo = lo.max(num(v) + 1)
        case GreaterThanOrEqual(_, v) => lo = lo.max(num(v))
        case LessThan(_, v) => hi = hi.min(num(v) - 1)
        case LessThanOrEqual(_, v) => hi = hi.min(num(v))
        case _ =>
      }
      Some((lo, hi))
    }
  }

  override def build(): Scan = {
    // option overrides session conf — a caller reading a cold archive can
    // pack more aggressively than the session's parquet-tuned default
    val maxBytes = Option(options.get("maxPartitionBytes")).map(_.toLong)
    val recursive = options.getBoolean("recursiveFileLookup", false)
    val allowEmpty = options.getBoolean("allowEmpty", false)
    val epochNamed = options.getBoolean("epochInFileName", false)
    // freeze the full option map HERE (the one read the user configured):
    // createReaderFactory runs later, on whatever session is then active
    import scala.jdk.CollectionConverters._
    new GtfsRtScan(path, required, maxBytes, recursive, allowEmpty,
      options.asCaseSensitiveMap().asScala.toMap,
      if (epochNamed) epochBounds else None)
  }
}

/** One planned split: a bin-packed batch of whole files (feeds are tiny —
  * a file never splits, partitions pack many files). */
final case class GtfsRtInputPartition(files: Seq[String]) extends InputPartition

final class GtfsRtScan(path: String, required: StructType,
                       maxBytesOpt: Option[Long], recursive: Boolean,
                       allowEmpty: Boolean,
                       options: Map[String, String],
                       epochBounds: Option[(Long, Long)] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required

  /** Streaming arrival-order detection switch (default on) — the
    * operator's recovery hatch: after investigating a detected
    * violation, `.option("strictArrivalCheck", "false")` restores the
    * pre-detection best-effort tail (late-sorting files are skipped)
    * so the stream is never permanently wedged on state it cannot
    * change. */
  private[sources] val strictArrival: Boolean = options.collectFirst {
    case (k, v) if k.equalsIgnoreCase("strictArrivalCheck") => v.toBoolean
  }.getOrElse(true)
  override def toBatch: Batch = this
  override def description(): String =
    s"GtfsRtScan path=$path cols=${required.fieldNames.mkString(",")}" +
      epochBounds.fold("") { case (lo, hi) => s" epochFiles=[$lo,$hi]" }

  /** The Hadoop conf for BOTH listing and executor-side reads: built-in
    * file sources fold datasource options into the per-read configuration
    * (`newHadoopConfWithOptions`), so per-read filesystem settings and
    * credentials passed as `.option(...)` take effect; building from the
    * bare session conf would silently ignore them. */
  private def hadoopConf() =
    SparkSession.active.sessionState.newHadoopConfWithOptions(options)

  /** One metadata-only listing pass: every VISIBLE `.pb` file under the
    * root (recursive when configured) plus every file resolved through a
    * `commit-*.manifest` (the connector's own atomic-commit unit — see
    * GtfsRtWrite), sorted by full path for determinism.
    *
    * Visibility rules (reader half of the manifest commit protocol):
    * files under a path segment starting with `_` or `.` are HIDDEN —
    * Spark's own file-source convention — which excludes both in-flight
    * `_temporary-*` trees (before this filter, a recursive read RACING a
    * write could list uncommitted task files) and committed
    * `_data-<qid>/` dirs; the latter become visible only through their
    * manifest, whose single publish rename is the commit's atomicity
    * point. Manifest lines resolve against the manifest's OWN directory,
    * so date-partitioned archives of committed writes read recursively.
    * Orphans in a data dir that a manifest does not list (speculative
    * task duplicates) stay invisible. Cost shape at scale: the same one
    * listing walk, plus one open per manifest (small, one line per file)
    * — no per-data-file RPCs beyond the listStatus the listing already
    * paid. */
  private[sources] def listFeedFiles(): Seq[FileStatus] = {
    val root = new Path(path)
    val fs = root.getFileSystem(hadoopConf())
    val listed = ArrayBuffer.empty[FileStatus]
    if (recursive) {
      val it = fs.listFiles(root, true)
      while (it.hasNext) listed += it.next()
    } else listed ++= fs.listStatus(root)
    // QUALIFIED root for the ancestor walk: FileStatus paths come back
    // fully qualified, so a relative/unqualified load path would never
    // match an ancestor, the walk would run past the archive root, and
    // a hidden-looking segment ABOVE it (a ".workspace" checkout, say)
    // would hide the whole archive
    val rootStr = fs.makeQualified(root).toUri.getPath
    def hidden(p: Path): Boolean = {
      // any segment strictly below the root starting with _ or .
      var cur = p.getParent
      var name = p.getName
      var h = name.startsWith("_") || name.startsWith(".")
      while (!h && cur != null && cur.toUri.getPath != rootStr) {
        val n = cur.getName
        h = n.startsWith("_") || n.startsWith(".")
        cur = cur.getParent
      }
      h
    }
    val visible = listed.toSeq.filter(st => st.isFile && !hidden(st.getPath))
    val bare = visible.filter(_.getPath.getName.endsWith(".pb"))
    val fromManifests = visible
      .filter(st => GtfsRtScan.ManifestName
        .findFirstIn(st.getPath.getName).isDefined)
      .flatMap { mst =>
        val base = mst.getPath.getParent
        val in = fs.open(mst.getPath)
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().map(_.trim).filter(_.nonEmpty).toList
        finally in.close()
        lines.map { rel =>
          // a manifest line whose file is gone (retention cleaned the
          // data dir, someone hand-deleted a file) must name the STALE
          // MANIFEST and the fix, not surface as a bare
          // FileNotFoundException that reads like archive corruption
          try fs.getFileStatus(new Path(base, rel))
          catch { case _: java.io.FileNotFoundException =>
            throw new java.io.FileNotFoundException(
              s"graft.sources.GtfsRtSource: commit manifest " +
                s"${mst.getPath} lists $rel, which no longer exists — " +
                "the manifest is stale (data dir cleaned up without it?); " +
                "delete the manifest to drop that commit from the archive")
          }
        }
      }
    val all = (bare ++ fromManifests)
      .groupBy(_.getPath.toString).map(_._2.head).toSeq
      .sortBy(_.getPath.toString)
    epochBounds.fold(all) { case (lo, hi) =>
      all.filter { st =>
        // keep files whose name-encoded epoch is in range — and every
        // file WITHOUT a parseable epoch (pruning must never guess)
        fileEpoch(st.getPath.getName).forall(e => e >= lo && e <= hi)
      }
    }
  }

  /** Trailing digit run of a `.pb` file name, the archive's epoch
    * convention: `..._1717200000.pb` / `part-00000-0-1717200000.pb`. */
  private def fileEpoch(name: String): Option[Long] = {
    val m = GtfsRtScan.EpochName.findFirstMatchIn(name)
    m.flatMap(g => scala.util.Try(g.group(1).toLong).toOption)
  }

  /** Greedy size-packed bins capped at maxPartitionBytes — task count
    * tracks data volume, not file count. */
  private[sources] def packFiles(files: Seq[FileStatus]): Array[InputPartition] = {
    val maxBytes = maxBytesOpt.getOrElse(SparkSession.active.sessionState
      .conf.filesMaxPartitionBytes).max(1L)
    val parts = ArrayBuffer.empty[GtfsRtInputPartition]
    val cur = ArrayBuffer.empty[String]
    var curBytes = 0L
    files.foreach { st =>
      if (cur.nonEmpty && curBytes + st.getLen > maxBytes) {
        parts += GtfsRtInputPartition(cur.toSeq); cur.clear(); curBytes = 0L
      }
      cur += st.getPath.toString; curBytes += st.getLen
    }
    if (cur.nonEmpty) parts += GtfsRtInputPartition(cur.toSeq)
    parts.toArray[InputPartition]
  }

  /** Driver-side split planning: list once, sort for determinism, greedy
    * size-packed bins capped at maxPartitionBytes. Listing is a single
    * namenode/liststatus round per directory (one recursive listFiles walk
    * with `recursiveFileLookup=true` — a date-partitioned archive keeps
    * its feeds in subdirectories) — metadata-only, never file content.
    *
    * Zero matching `.pb` files FAILS rather than planning an empty scan:
    * a typo'd archive path is indistinguishable from an empty one at this
    * layer, and a silent zero-row DataFrame over 100 TB of misaddressed
    * feeds is the expensive kind of wrong. `allowEmpty=true` opts a
    * legitimately-empty archive back into the zero-row read. */
  override def planInputPartitions(): Array[InputPartition] = {
    val files = listFeedFiles()
    if (files.isEmpty && !allowEmpty)
      throw new java.io.FileNotFoundException(
        s"graft.sources.GtfsRtSource: no .pb files under $path" +
          (if (recursive) " (recursive)"
           else " (set recursiveFileLookup=true for partitioned archives)") +
          "; set allowEmpty=true to read an empty archive as zero rows")
    packFiles(files)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(hadoopConf())
    GtfsRtReaderFactory(required, conf)
  }

  /** Streaming read of the SAME archive — `spark.readStream.format(...)`
    * tails the feed directory: each micro-batch reads exactly the files
    * that arrived since the last committed offset (the reference's cron
    * fetch loop drops one timestamp-named snapshot per tick,
    * reference/scripts/realtime_extractor.py:97-118, so lexicographic
    * path order IS arrival order — the offset is simply the largest
    * path processed, one short string per batch in the offset log,
    * never a seen-files set that grows with archive age). Late files
    * sorting BELOW the watermark are ignored by construction —
    * acceptable for monotonic snapshot names, and the documented
    * contract here. Column pruning and bin-packing are the batch
    * path's, reused verbatim. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GtfsRtMicroBatchStream(this)
}

/** Watermark offset: the largest feed-file path read so far ("" = start
  * of the archive). */
object GtfsRtScan {
  /** Name-encoded epoch: the trailing digit run before `.pb`, preceded
    * by a separator (never digits glued to other digits). */
  private[sources] val EpochName = "[-_](\\d+)\\.pb$".r

  /** Commit-manifest file names (the writer's atomic publish unit —
    * must agree with [[GtfsRtWrite.manifestName]]). */
  private[sources] val ManifestName = "^commit-[0-9a-zA-Z]+\\.manifest$".r
}

final case class GtfsRtOffset(maxPath: String, maxMod: Long = 0L)
    extends Offset {
  override def json(): String =
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.JObject("maxPath" -> org.json4s.JString(maxPath),
        "maxMod" -> org.json4s.JLong(maxMod)))
}

/** Tails the archive with a PATH-ordered watermark (`maxPath` = largest
  * path processed): O(1) offset state at any archive size, correct for
  * producers whose file names are MONOTONE in arrival order — the
  * FetchLoop drop-dir contract (`snap_<epoch>.pb`) and any
  * epoch-named archive. A producer that violates it (e.g. pointing
  * readStream at an archive receiving BATCH connector commits, whose
  * queryId-fragment names carry no order) would silently lose the
  * late-sorting files — so the offset carries a second leg, the max
  * modification time at watermark, and `latestOffset` FAILS with the
  * contract named when a file strictly newer than the watermark sorts
  * strictly below `maxPath` (the same check also catches in-place
  * rewrites of processed files — EXCEPT a rewrite of the watermark
  * file itself, which is deliberately excluded: a non-atomic
  * producer's newest file can legitimately gain its close-time mtime
  * after the offset commits, and flagging that would wedge the stream
  * on state the operator cannot change — see `latestFrom`). Detection,
  * not silent drop; bounded state either way. Old single-leg
  * checkpoints deserialize with
  * maxMod = 0, which disables detection until the next offset is
  * written (never fails a resumed stream spuriously). */
final class GtfsRtMicroBatchStream(scan: GtfsRtScan) extends MicroBatchStream
    with SupportsAdmissionControl {
  override def initialOffset(): Offset = GtfsRtOffset("", 0L)

  // the engine prefers the admission-control overload whenever the
  // interface is implemented; this variant exists only for the trait
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the supported entry")

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    latestFrom(start.asInstanceOf[GtfsRtOffset])

  private[sources] def latestFrom(prev: GtfsRtOffset): GtfsRtOffset = {
    val files = scan.listFeedFiles()
    // strictly-below only: the watermark file ITSELF is excluded — a
    // non-atomic producer's newest file can be listed mid-write and get
    // its close-time mtime after the offset commits, and flagging that
    // would wedge the stream forever on state the operator cannot
    // change (FetchLoop's temp+atomic-move never hits this; the
    // detection exists for foreign producers). Detection is also only
    // as fine as the filesystem's mtime granularity: a late-sorting
    // file stamped the SAME instant as the watermark passes unseen.
    val late = files.filter(st => scan.strictArrival &&
      st.getModificationTime > prev.maxMod &&
      prev.maxMod > 0L && st.getPath.toString < prev.maxPath)
    if (late.nonEmpty)
      throw new IllegalStateException(
        "graft.sources.GtfsRtSource streaming requires file names " +
          "monotone in arrival order (the snap_<epoch>.pb convention): " +
          s"file(s) newer than the committed watermark sort below it " +
          s"and would be silently skipped: " +
          late.map(_.getPath.getName).mkString(", ") +
          ". Stream from a FetchLoop-style drop directory, batch-read " +
          "manifest archives, or set strictArrivalCheck=false to " +
          "accept the skip and unwedge the stream.")
    if (files.isEmpty) prev
    else {
      val lastPath = files.last.getPath.toString
      GtfsRtOffset(
        if (lastPath > prev.maxPath) lastPath else prev.maxPath,
        files.map(_.getModificationTime).max.max(prev.maxMod))
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[GtfsRtOffset].maxPath
    val hi = end.asInstanceOf[GtfsRtOffset].maxPath
    scan.packFiles(scan.listFeedFiles().filter { st =>
      val p = st.getPath.toString
      p > lo && p <= hi
    })
  }

  override def createReaderFactory(): PartitionReaderFactory =
    scan.createReaderFactory()

  override def deserializeOffset(json: String): Offset = {
    val parsed = org.json4s.jackson.JsonMethods.parse(json)
    val org.json4s.JString(p) = parsed \ "maxPath": @unchecked
    val mod = parsed \ "maxMod" match {
      case org.json4s.JInt(m) => m.toLong
      case org.json4s.JLong(m) => m
      case _ => 0L // pre-r10 single-leg checkpoint
    }
    GtfsRtOffset(p, mod)
  }

  // nothing to clean up: the committed watermark fully describes progress
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class GtfsRtReaderFactory(required: StructType,
                                     conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GtfsRtPartitionReader(
      partition.asInstanceOf[GtfsRtInputPartition].files, required, conf)
}

/** Executor-side reader: streams the partition's files one at a time —
  * decode + flatten + project — holding one decoded feed in memory at
  * once (feeds are snapshot-sized; the partition's byte budget is the
  * planner's maxPartitionBytes). */
final class GtfsRtPartitionReader(files: Seq[String], required: StructType,
                                  conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  // Per-required-field extractors resolved ONCE against the full schema:
  // the row loop is a flat array walk, and pruned fields are never
  // materialized (no UTF8String conversion for dropped strings).
  private val getters: Array[(FeedMessage, graft.gtfs.RtRow) => Any] =
    required.fields.map(_.name match {
      case "trip_id" => (_, r) => UTF8String.fromString(r.trip_id)
      case "start_date" => (_, r) => UTF8String.fromString(r.start_date)
      case "stop_sequence" => (_, r) => r.stop_sequence
      case "stop_id" => (_, r) => UTF8String.fromString(r.stop_id)
      case "arrival_epoch" => (_, r) => r.arrival_epoch.map(Long.box).orNull
      case "departure_epoch" => (_, r) => r.departure_epoch.map(Long.box).orNull
      case "feed_epoch" => (m, _) => m.header.timestamp.map(Long.box).orNull
      case other => throw new IllegalArgumentException(
        s"unknown column $other for graft.sources.GtfsRtSource")
    })

  private val fileIter = files.iterator
  private var feed: FeedMessage = _
  private var rowIter: Iterator[graft.gtfs.RtRow] = Iterator.empty
  private var current: InternalRow = _

  private def advanceFile(): Boolean = {
    if (!fileIter.hasNext) return false
    val file = fileIter.next()
    val p = new Path(file)
    val fs = p.getFileSystem(conf.value)
    val in = fs.open(p)
    val bytes =
      try in.readAllBytes()
      finally in.close()
    feed =
      try Rt.decode(bytes)
      catch {
        // NonFatal, not just IllegalArgumentException: the class doc
        // promises every corrupt snapshot fails with its path attached,
        // and pathological inputs can escape Pb.Reader with other
        // exception types than the codec's own parse error
        case scala.util.control.NonFatal(e) =>
          throw new java.io.IOException(s"corrupt GTFS-RT feed $file", e)
      }
    rowIter = Rt.flatten(feed).iterator
    true
  }

  override def next(): Boolean = {
    while (!rowIter.hasNext) if (!advanceFile()) return false
    val r = rowIter.next()
    val values = new Array[Any](getters.length)
    var i = 0
    while (i < getters.length) { values(i) = getters(i)(feed, r); i += 1 }
    current = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
