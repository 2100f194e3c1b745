package graft.pipelines

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import java.time.{LocalDateTime, ZoneId}
import org.apache.spark.sql.functions._

/** E2 end-to-end over real CSV files (SURVEY.md §5 item 4), including the
  * >24h clock and the calendar_dates fanout. */
class HistoricalSpec extends SparkSpec {

  private def writeFixtures(): String = {
    val dir = Paths.get("target", "test_gtfs")
    Files.createDirectories(dir)
    def w(name: String, body: String): Unit =
      Files.writeString(dir.resolve(name), body)
    // extra_col exercises "agencies add columns freely" — ignored by name
    w("stop_times.txt",
      """trip_id,stop_sequence,stop_id,arrival_time,departure_time,extra_col
        |T1,1,10,25:10:00,25:11:00,x
        |T1,2,11,08:00:00,08:01:00,y
        |""".stripMargin)
    w("trips.txt", "trip_id,service_id,route_id\nT1,5,R1\n")
    w("calendar_dates.txt", "service_id,date\n5,20240601\n5,20240602\n")
    w("stops.txt",
      "stop_id,stop_name,stop_lat,stop_lon\n10,Main,46.5,-80.9\n11,Second,46.6,-81.0\n")
    w("routes.txt", "route_id,route_long_name\nR1,Main Line\n")
    dir.toString
  }

  test("readGtfsZip: E2 consumes the GTFS zip end to end (S3)") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = writeFixtures()
    val zip = Paths.get("target", "test_gtfs.zip")
    Files.deleteIfExists(zip)
    val zos = new ZipOutputStream(Files.newOutputStream(zip))
    for (m <- Seq("stop_times", "trips", "calendar_dates", "stops", "routes")) {
      zos.putNextEntry(new ZipEntry(s"$m.txt"))
      zos.write(Files.readAllBytes(Paths.get(dir, s"$m.txt")))
      zos.closeEntry()
    }
    zos.close()
    // the network boundary first: "download" the zip via the 503-tolerant
    // transport (file: URL here), landed atomically
    val fetched = Paths.get("target", "test_gtfs_fetched.zip")
    Files.deleteIfExists(fetched)
    assert(Historical.fetchGtfsZip(zip.toUri.toString, fetched.toString)
      === Some(fetched))
    val work = Paths.get("target", "test_gtfs_unzipped")
    org.apache.commons.io.FileUtils.deleteQuietly(work.toFile)
    val (st, tr, cd, sp, rt) =
      Historical.readGtfsZip(spark, fetched.toString, work.toString)
    val out = Historical.build(st, tr, cd, sp, rt, tz = "America/Toronto")
    assert(out.count() === 4L) // 2 stop_times × 2 service dates
  }

  test("extractZip rejects zip-slip entries") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val evil = Paths.get("target", "test_evil.zip")
    Files.deleteIfExists(evil)
    val zos = new ZipOutputStream(Files.newOutputStream(evil))
    zos.putNextEntry(new ZipEntry("../evil.txt"))
    zos.write("x".getBytes)
    zos.closeEntry()
    zos.close()
    intercept[IllegalArgumentException] {
      Historical.extractZip(evil.toString, "target/test_evil_out")
    }
  }

  test("historical pipeline: joins, fanout, >24h clock, geo concat") {
    val dir = writeFixtures()
    val (st, tr, cd, sp, rt) = Historical.readGtfsDir(spark, dir)
    val out = Historical.build(st, tr, cd, sp, rt, tz = "America/Toronto")
    val rows = out
      .select(col("trip_id"), col("start_date").cast("string"),
        col("stop_sequence"), col("stop_id"), col("route_id"),
        col("stop_name"), col("route_long_name"),
        unix_timestamp(col("arrival_time")).as("arr"),
        col("geo_coordinates"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5), r.getString(6), r.getLong(7),
        r.getString(8)))
      .toSet

    def localEpoch(y: Int, mo: Int, d: Int, h: Int, mi: Int): Long =
      LocalDateTime.of(y, mo, d, h, mi)
        .atZone(ZoneId.of("America/Toronto")).toInstant.getEpochSecond

    // 2 stop_times × 2 service dates = 4 rows; 25:10 on 06-01 = 06-02 01:10 local
    assert(rows === Set(
      ("T1", "2024-06-01", 1L, 10L, "R1", "Main", "Main Line",
        localEpoch(2024, 6, 2, 1, 10), "46.5, -80.9"),
      ("T1", "2024-06-01", 2L, 11L, "R1", "Second", "Main Line",
        localEpoch(2024, 6, 1, 8, 0), "46.6, -81.0"),
      ("T1", "2024-06-02", 1L, 10L, "R1", "Main", "Main Line",
        localEpoch(2024, 6, 3, 1, 10), "46.5, -80.9"),
      ("T1", "2024-06-02", 2L, 11L, "R1", "Second", "Main Line",
        localEpoch(2024, 6, 2, 8, 0), "46.6, -81.0")))
  }
}
