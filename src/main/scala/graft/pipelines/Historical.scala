package graft.pipelines

import graft.functions.TimeOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E2 — the reference's historical GTFS loader
  * (`reference/scripts/historical_extractor.py:39-98`): read the 5 static
  * GTFS CSV members, run the 4-way dimension join chain (J1-J4), normalize
  * the GTFS >24h service-day clocks to UTC instants (F1), parse the
  * yyyyMMdd service date (F2), rename it to start_date (P2), concatenate
  * the geo string (P3), and project the gtfs_data schema (P1).
  *
  * Scale notes: stop_times is the fact side (fans out 1-to-many per
  * service date through calendar_dates, J2) and is the only large input —
  * trips/calendar_dates/stops/routes are genuine dimensions (hundreds of
  * rows for a city agency, thousands for a national one) and are broadcast
  * explicitly, so the whole pipeline is a single scan of stop_times with
  * map-side joins: no shuffle until the sink. The reference chunks
  * stop_times at 5,000 rows for memory (S4); Spark's file splits are the
  * same idea, done by the scan.
  */
object Historical {

  /** Read one GTFS CSV member (e.g. "stop_times") from an extracted GTFS
    * directory. GTFS is an untyped CSV standard, so values load as strings
    * and [[build]] casts the consumed columns by NAME — agencies add extra
    * columns freely and the reference's pandas read ignores them the same
    * way (historical_extractor.py:54-58). The zip unpack is a driver-side
    * pre-step, exactly as in the reference (S3). */
  def member(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.option("header", "true").csv(s"$dir/$name.txt")

  /** Read all 5 consumed members from an extracted GTFS dir. */
  def readGtfsDir(spark: SparkSession, dir: String):
      (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) =
    (member(spark, dir, "stop_times"), member(spark, dir, "trips"),
      member(spark, dir, "calendar_dates"), member(spark, dir, "stops"),
      member(spark, dir, "routes"))

  /** S3 — the zip unpack step itself (reference/scripts/
    * historical_extractor.py:15,45-48: GTFS ships as one zip of .txt
    * members). Driver-side by design: a GTFS zip is megabytes (it holds
    * the schedule, not the data), and the zip format's central directory
    * makes it unsplittable anyway — the distributed work starts at the
    * extracted CSVs, which Spark then scans with file-level parallelism.
    * Entry names are sanitized against zip-slip. Returns extracted paths. */
  def extractZip(zipPath: String, destDir: String): Seq[java.nio.file.Path] = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dest = Paths.get(destDir).toAbsolutePath.normalize()
    Files.createDirectories(dest)
    val in = new java.util.zip.ZipInputStream(
      Files.newInputStream(Paths.get(zipPath)))
    try {
      Iterator.continually(in.getNextEntry).takeWhile(_ != null)
        .filterNot(_.isDirectory)
        .map { entry =>
          val out = dest.resolve(entry.getName).normalize()
          require(out.startsWith(dest),
            s"zip entry escapes destination: ${entry.getName}")
          Option(out.getParent).foreach(Files.createDirectories(_))
          Files.copy(in, out, StandardCopyOption.REPLACE_EXISTING)
          out
        }.toList
    } finally in.close()
  }

  /** E2 from the zip, as the reference consumes it: extract into `workDir`
    * then read the 5 members. */
  def readGtfsZip(spark: SparkSession, zipPath: String, workDir: String):
      (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    extractZip(zipPath, workDir)
    readGtfsDir(spark, workDir)
  }

  /** The E2 network boundary (reference/scripts/historical_extractor.py:
    * 45-48: one HTTP GET of the agency's GTFS zip): fetch via the shared
    * 503-tolerant transport and land atomically. None on a tolerated
    * miss — "retry next scheduled run", like the realtime fetcher. */
  def fetchGtfsZip(url: String, destPath: String): Option[java.nio.file.Path] =
    graft.gtfs.Rt.fetch(url).map { bytes =>
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val dest = Paths.get(destPath)
      Option(dest.getParent).foreach(Files.createDirectories(_))
      val tmp = dest.resolveSibling(dest.getFileName.toString + ".tmp")
      Files.write(tmp, bytes)
      Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      dest
    }

  /** The J1-J4 + F1/F2 + P1-P3 pipeline producing the gtfs_data schema
    * (schedule side of [[DiffTimes]]). `tz` is the agency's local zone —
    * GTFS clock strings are local wall times (historical_extractor.py:35). */
  def build(stopTimes: DataFrame, trips: DataFrame, calendarDates: DataFrame,
            stops: DataFrame, routes: DataFrame,
            tz: String = "America/Toronto"): DataFrame = {
    val st = stopTimes.select(col("trip_id").cast("string").as("trip_id"),
      col("stop_sequence").cast("long").as("stop_sequence"),
      col("stop_id").cast("long").as("stop_id"),
      col("arrival_time").cast("string").as("arrival_time"),
      col("departure_time").cast("string").as("departure_time"))
    val tr = trips.select(col("trip_id").cast("string").as("trip_id"),
      col("service_id").cast("long").as("service_id"),
      col("route_id").cast("string").as("route_id"))
    val cd = calendarDates.select(col("service_id").cast("long").as("service_id"),
      col("date").cast("string").as("date"))
    val sp = stops.select(col("stop_id").cast("long").as("stop_id"),
      col("stop_name").cast("string").as("stop_name"),
      col("stop_lat").cast("string").as("stop_lat"),
      col("stop_lon").cast("string").as("stop_lon"))
    val rt = routes.select(col("route_id").cast("string").as("route_id"),
      col("route_long_name").cast("string").as("route_long_name"))
    val joined = st
      .join(broadcast(tr), "trip_id")    // J1
      .join(broadcast(cd), "service_id") // J2 — per-service-date fanout
      .join(broadcast(sp), "stop_id")    // J3
      .join(broadcast(rt), "route_id")   // J4
    val startDate = to_date(col("date"), "yyyyMMdd") // F2
    joined.select(                                    // P1 projection
      col("trip_id"),
      startDate.as("start_date"),                     // P2 rename
      col("stop_sequence"),
      col("stop_id"),
      col("route_id"),
      col("stop_name"),
      col("route_long_name"),
      TimeOps.gtfsTimestamp(startDate, col("arrival_time"), tz) // F1
        .as("arrival_time"),
      TimeOps.gtfsTimestamp(startDate, col("departure_time"), tz)
        .as("departure_time"),
      concat_ws(", ", col("stop_lat"), col("stop_lon"))          // P3
        .as("geo_coordinates"))
  }
}
