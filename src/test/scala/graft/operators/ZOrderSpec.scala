package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Morton interleave correctness and the layout contract of the
  * z-ordered write (disjoint per-file z ranges, 2-D locality). */
class ZOrderSpec extends SparkSpec {

  private def zRef(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits; j <- xs.indices)
      z |= (((xs(j) >> i) & 1L) << (i * xs.size + j))
    z
  }

  test("zValue equals the reference interleave for 2 and 3 columns") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val rows = (1 to 500).map(_ =>
      (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong,
        rnd.nextInt(256).toLong))
    val df = rows.toDF("x", "y", "w")
    val got2 = df.select(col("x"), col("y"),
        ZOrder.zValue(Seq(col("x"), col("y")), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (x, y, _) =>
      assert(got2((x, y)) === zRef(Seq(x, y), 8)) }
    val got3 = df.select(col("x"), col("y"), col("w"),
        ZOrder.zValue(Seq(col("x"), col("y"), col("w")), 8).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    rows.foreach { case (x, y, w) =>
      assert(got3((x, y, w)) === zRef(Seq(x, y, w), 8)) }
  }

  test("zorderedWrite: part files carry pairwise-disjoint z ranges, and " +
    "a 2-D box predicate's candidate file set shows locality (min-max " +
    "skipping would prune most files)") {
    import spark.implicits._
    val base = java.nio.file.Paths.get("target", "test_zorder")
    org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    val out = base.toString
    // a full 64x64 grid — every cell once, scrambled input order
    val rnd = new scala.util.Random(13)
    val grid = rnd.shuffle((0L until 64L).flatMap(x =>
      (0L until 64L).map(y => (x, y))).toVector)
    val df = grid.toDF("x", "y").repartition(8)
    val saved = scala.util.Try(
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")).toOption
    try {
      // tiny fixture: hold off AQE coalescing so multiple files land
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      ZOrder.zorderedWrite(df,
        ZOrder.zValue(Seq(col("x"), col("y")), 6), out)
    } finally saved match {
      case Some(v) =>
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", v)
      case None =>
        spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    }
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-")).map(_.getPath).sorted
    assert(files.length > 1, "fixture produced a single file")
    case class Span(zMin: Long, zMax: Long, xMin: Long, xMax: Long,
                    yMin: Long, yMax: Long)
    val spans = files.map { f =>
      val rows = spark.read.parquet(f)
        .select(col("x"), col("y"),
          ZOrder.zValue(Seq(col("x"), col("y")), 6).as("z"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      Span(rows.map(_._3).min, rows.map(_._3).max,
        rows.map(_._1).min, rows.map(_._1).max,
        rows.map(_._2).min, rows.map(_._2).max)
    }
    // range partitioning on z ⇒ file z ranges are pairwise disjoint
    val byZ = spans.sortBy(_.zMin)
    byZ.sliding(2).foreach {
      case Array(a, b) => assert(a.zMax < b.zMin, s"overlap: $a vs $b")
      case _ => ()
    }
    // locality: a 16x16 corner box intersects few files' (x,y) min-max
    // footprints — the skip-index property. A row-scrambled layout would
    // leave every file's footprint covering the whole grid.
    val candidates = spans.count(s =>
      s.xMin <= 15 && s.xMax >= 0 && s.yMin <= 15 && s.yMax >= 0)
    assert(candidates < files.length,
      s"no locality: box intersects all ${files.length} files")
  }
}
