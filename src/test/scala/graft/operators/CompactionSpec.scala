package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The compaction executor vs its plan: byte identity (every row
  * survives, nothing added), one physical file per planned bin,
  * clustering preservation (bin key ranges never overlap within a
  * partition — min/max pruning on the clustering key survives the
  * rewrite), manifest-gated visibility, and the committed-run guard. */
class CompactionSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val d = s"target/compaction_spec_$name"
    val p = new org.apache.hadoop.fs.Path(d)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    d
  }

  private def input = {
    import spark.implicits._
    // 3 partitions ('a','b','c') × 40 days, uneven per-day rows (1..13)
    // so bins pack unevenly; payload column rides along
    (for {
      pt <- Seq("a", "b", "c")
      day <- 1 to 40
      i <- 1 to (day % 13) + 1
    } yield (pt, day.toLong, s"$pt-$day-$i", day * 100L + i))
      .toDF("pt", "day", "payload", "v")
  }

  test("execute delivers the plan: every row survives byte-identically, " +
    "one file per bin, bin day-ranges contiguous and non-overlapping") {
    val out = freshDir("roundtrip")
    val df = input
    Compaction.execute(df, "pt", "day", targetRows = 25L, out, "spec1")
    val back = Compaction.readCompacted(spark, out)
    // byte identity: the full row multiset survives (bin is the only
    // added column)
    val before = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(identity).map { case (k, v) => (k, v.length) }
    val after = back.select("pt", "day", "payload", "v").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(identity).map { case (k, v) => (k, v.length) }
    assert(after === before)
    // one physical file per (pt, bin), matching the plan's bins exactly
    val files = back.groupBy(col("pt"), col("bin"))
      .agg(countDistinct(col("_metadata.file_path")).as("nf"),
        min("day").as("lo"), max("day").as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    files.foreach { case (k, (nf, _, _, _)) =>
      assert(nf === 1L, s"bin $k split across files")
    }
    val plan = Compaction.plan(
        df.groupBy(col("pt"), col("day")).agg(count(lit(1)).as("n_rows")),
        "pt", "day", 25L)
      .groupBy("pt", "bin")
      .agg(sum("n_rows").as("n"), min("day").as("lo"), max("day").as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(files.keySet === plan.keySet)
    files.foreach { case (k, (_, lo, hi, n)) =>
      assert((plan(k)._2, plan(k)._3, plan(k)._1) === ((lo, hi, n)), s"bin $k")
    }
    // clustering preserved: within a partition, bins tile the day axis
    // in bin order without overlap — file-level min/max pruning on day
    // keeps working after the rewrite
    files.keys.groupBy(_._1).foreach { case (pt, ks) =>
      val ordered = ks.toSeq.sortBy(_._2).map(files)
      ordered.sliding(2).foreach {
        case Seq((_, _, hi1, _), (_, lo2, _, _)) =>
          assert(hi1 < lo2, s"partition $pt: bin ranges overlap")
        case _ =>
      }
    }
  }

  test("visibility is manifest-gated: orphan parquet files in the data " +
    "dir are never read, and a committed run id refuses to re-commit") {
    val out = freshDir("manifest")
    val df = input
    Compaction.execute(df, "pt", "day", targetRows = 25L, out, "spec2")
    val n = Compaction.readCompacted(spark, out).count()
    // plant an orphan parquet file inside the committed data dir (a
    // crashed speculative task's leftover): readCompacted must not see it
    df.limit(7).write.mode("overwrite")
      .parquet(s"$out/_data-spec2/pt=a/bin=0/_orphan")
    assert(Compaction.readCompacted(spark, out).count() === n)
    // retry-of-a-committed-run guard
    val e = intercept[java.io.IOException] {
      Compaction.execute(df, "pt", "day", 25L, out, "spec2")
    }
    assert(e.getMessage.contains("already"))
  }
}
