package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native merge-walk intersection vs the built-in hash spelling, on
  * the contract shape (sorted distinct arrays — what array_sort over a
  * shingle SET produces). */
class SortedIntersectSpec extends SparkSpec {

  test("matches size(array_intersect(...)) on random sorted-distinct " +
    "string sets, including empty and disjoint sides") {
    import spark.implicits._
    val rnd = new scala.util.Random(23L)
    val vocab = (0 until 60).map(i => s"tok_$i")
    def set(): Seq[String] =
      rnd.shuffle(vocab).take(rnd.nextInt(20)).sorted
    val rows = Seq.fill(200)((set(), set())) :+
      (Seq.empty[String], Seq("a", "b")) :+
      (Seq("a"), Seq("b")) :+
      (Seq("a", "b", "c"), Seq("a", "b", "c"))
    val got = rows.toDF("a", "b").select(
      SortedIntersectCount.sortedIntersect(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("long-array overload matches size(array_intersect(...)) on random " +
    "sorted-distinct long sets, including negatives (xxhash64 range), " +
    "empty and disjoint sides") {
    import spark.implicits._
    val rnd = new scala.util.Random(41L)
    // xxhash64 values span the full signed range — the merge walk must
    // order negatives before positives exactly like array_sort does
    def set(): Seq[Long] =
      Seq.fill(rnd.nextInt(24))(rnd.nextLong()).distinct.sorted
    val rows = Seq.fill(200)((set(), set())) :+
      (Seq.empty[Long], Seq(1L, 2L)) :+
      (Seq(-5L, 3L), Seq(-5L, -1L, 3L)) :+
      (Seq(Long.MinValue, 0L, Long.MaxValue),
        Seq(Long.MinValue, Long.MaxValue))
    val got = rows.toDF("a", "b").select(
      SortedIntersectCount.sortedIntersect(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("NULL side yields NULL; non-ASCII and prefix-sharing strings " +
    "compare in the same binary order as array_sort") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq("a")), None: Option[Seq[String]]),
      (Some(Seq("a", "ab", "abc", "b", "é")), Some(Seq("ab", "b", "é"))))
      .toDF("a", "b")
    val rows = df.select(
      SortedIntersectCount.sortedIntersect(
        array_sort(col("a")), array_sort(col("b")))).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getLong(0) === 3L)
  }
}
