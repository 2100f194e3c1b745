package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.streaming.Trigger

/** §2.9 — streaming upsert over a file source: two micro-batch rounds
  * (separate query starts sharing a checkpoint, i.e. restart-resume),
  * asserting S9 semantics on the keyed snapshot. */
class RealtimeStreamSpec extends SparkSpec {

  test("foreachBatch upsert maintains the keyed snapshot across batches") {
    val base = Paths.get("target", "test_stream")
    org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    val src = base.resolve("src"); Files.createDirectories(src)
    val tgt = base.resolve("tgt").toString
    val chk = base.resolve("chk").toString

    def runRound(): Unit = {
      val stream = spark.readStream
        .schema("k LONG, v STRING, seq LONG, created LONG, updated LONG")
        .csv(src.toString)
      val q = RealtimeStream.start(stream, tgt, chk,
        keys = Seq("k"), compareCols = Seq("v"), orderCol = "seq",
        createdCol = Some("created"), trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }

    // Batch 1: keys 1 and 2 (key 1 appears twice — latest seq wins).
    Files.writeString(src.resolve("b1.csv"),
      "1,a,1,100,100\n1,a2,2,100,100\n2,b,1,100,100\n")
    runRound()
    val snap1 = spark.read.parquet(tgt).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4))).toSet
    assert(snap1 === Set((1L, "a2", 100L, 100L), (2L, "b", 100L, 100L)))

    // Batch 2 (restart from checkpoint): key 1 changed, key 2 unchanged,
    // key 3 new.
    Files.writeString(src.resolve("b2.csv"),
      "1,A,3,200,200\n2,b,3,200,200\n3,c,1,200,200\n")
    runRound()
    val snap2 = spark.read.parquet(tgt).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4))).toSet
    assert(snap2 === Set(
      (1L, "A", 100L, 200L), // changed: created preserved, updated stamped
      (2L, "b", 100L, 100L), // unchanged: untouched
      (3L, "c", 200L, 200L)  // new: inserted
    ))
  }
}
