package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal batch plumbing: decode stub, frame sampling (1→N), resize. */
class MultiModalSpec extends SparkSpec {

  private def media(text: String) = {
    import spark.implicits._
    implicit val s = spark
    MultiModal.mediaFromDocuments(
      Seq((1L, text, text.length.toLong)).toDF("doc_id", "text", "n_chars"))
  }

  test("decodeStub: byte length, first byte, deterministic fingerprint") {
    implicit val s = spark
    val f = MultiModal.extractFeatures(media("abc")).collect().head
    assert(f.byte_len === 3L)
    assert(f.first_byte === 'a'.toLong)
    val want = "abc".getBytes("UTF-8")
      .foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % MultiModal.Mod)
    assert(f.content_fp === want)
    assert(f.n_frames === 3L % 30L + 1L)
  }

  test("sampleFrames: every step-th fixed-size frame, short tail kept") {
    implicit val s = spark
    val text = "x" * 100 // 4 frames of 32,32,32,4 → sampled idx 0 and 2
    val rows = MultiModal.sampleFrames(media(text), step = 2)
      .collect().sortBy(_.frame_idx)
    assert(rows.map(_.frame_idx).toSeq === Seq(0L, 2L))
    assert(rows.map(_.frame_len).toSeq === Seq(32L, 32L))
    val tail = MultiModal.sampleFrames(media("x" * 100), step = 1)
      .collect().sortBy(_.frame_idx)
    assert(tail.map(_.frame_len).toSeq === Seq(32L, 32L, 32L, 4L))
  }

  test("resizeStub: keeps every factor-th byte and scales dims") {
    implicit val s = spark
    val r = MultiModal.resizeStub(media("abcdefg"), factor = 3).collect().head
    // kept bytes: a, d, g
    assert(r.out_len === 3L)
    val want = Array('a', 'd', 'g').map(_.toByte)
      .foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % MultiModal.Mod)
    assert(r.out_fp === want)
    assert(r.width === (7L % 640L) / 3L)
  }

  test("extractFeaturesArrow == extractFeatures row-for-row on the real " +
    "documents table, across batch boundaries (batchSize 7 forces " +
    "partial final batches) and empty/nonempty blobs") {
    implicit val s = spark
    val m = MultiModal.mediaFromDocuments(
      graft.Tables.t(spark, "/root/testdata/sf0.001", "documents"))
    val rowPath = MultiModal.extractFeatures(m).collect().sortBy(_.doc_id)
    val arrowPath = MultiModal.extractFeaturesArrow(m, batchSize = 7)
      .collect().sortBy(_.doc_id)
    assert(arrowPath.length === rowPath.length)
    assert(arrowPath.toSeq === rowPath.toSeq)
  }

  test("extractFeaturesArrow handles the empty blob inside a batch") {
    implicit val s = spark
    import spark.implicits._
    val m = MultiModal.mediaFromDocuments(
      Seq((1L, "", 0L), (2L, "ab", 2L)).toDF("doc_id", "text", "n_chars"))
    val got = MultiModal.extractFeaturesArrow(m, batchSize = 2)
      .collect().sortBy(_.doc_id)
    assert(got(0).byte_len === 0L && got(0).first_byte === -1L &&
      got(0).content_fp === 0L)
    assert(got(1).byte_len === 2L && got(1).first_byte === 'a'.toLong)
  }

  test("empty media: no frames, empty resize") {
    implicit val s = spark
    assert(MultiModal.sampleFrames(media(""), step = 1).count() === 0L)
    val r = MultiModal.resizeStub(media(""), factor = 2).collect().head
    assert(r.out_len === 0L && r.out_fp === 0L)
  }

  test("segment walk vs marker scan: on the adversarial blob (FFC0 " +
    "decoy inside the APP1 payload) the walk lands on the true SOF0 " +
    "and recovers the builder's dimensions, while a locate()-style " +
    "scan provably finds the decoy first") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // doc 1 (odd -> jpeg), n_chars 123: w = 124, h = 124
    val doc = Seq((1L, "x", 123L)).toDF("doc_id", "text", "n_chars")
    val blob = MultiModal.imageHeaderBlobsAdversarial(doc)
    val scanned = blob.select(locate("FFC0", hex(col("media"))).as("scan"),
        MultiModal.sofHexPos(hex(col("media")), 3).as("walk"))
      .collect().head
    assert(scanned.getInt(0) === 49, "decoy not where the blob promises")
    assert(scanned.getInt(1) === 61, "walk did not hop to the true SOF0")
    val parsed = MultiModal.parseImageHeaders(blob).collect().head
    assert(parsed.getAs[String]("fmt") === "jpeg")
    assert(parsed.getAs[Long]("width") === 124L)
    assert(parsed.getAs[Long]("height") === 124L)
    assert(parsed.getAs[Long]("bit_depth") === 8L) // SOF0 precision byte
  }
}
