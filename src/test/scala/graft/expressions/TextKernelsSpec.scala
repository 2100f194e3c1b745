package graft.expressions

import graft.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native text kernels vs the HOF spellings they replace — tokens,
  * shingles (order AND first-occurrence-distinctness), poly hashes — over
  * adversarial whitespace/unicode inputs, plus codegen participation. */
class TextKernelsSpec extends SparkSpec {

  private def texts: DataFrame = {
    import spark.implicits._
    Seq(
      "the quick brown fox",
      "  leading and   multiple   spaces  ",
      "",
      " ",
      "single",
      "dup dup dup dup",
      "a b a b a b", // repeated bigrams → distinct must collapse, in order
      "naïve 日本語 \uD83D\uDE00 mix",
      "tail space ",
      "a"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("tokens kernel == filter(split) HOF on adversarial whitespace") {
    val got = texts.select(
      TextAnalysis.tokens(col("text")).as("native"),
      TextAnalysis.tokensHof(col("text")).as("hof")).collect()
    got.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("ngram shingle kernel == zip_with/concat/distinct HOF for n=1..4, " +
    "including element ORDER") {
    for (n <- 1 to 4) {
      val tk = TextAnalysis.tokens(col("text"))
      val got = texts.select(
        TextAnalysis.ngramShingles(tk, n).as("native"),
        TextAnalysis.ngramShinglesHof(TextAnalysis.tokensHof(col("text")), n)
          .as("hof")).collect()
      got.foreach(r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"n=$n"))
    }
  }

  test("positional n-gram kernel == zip_with/concat/filter HOF for " +
    "n=1..4 — every window, positional order, duplicates KEPT, and " +
    "null-token windows dropped like the HOF's null-poisoned concats") {
    for (n <- 1 to 4) {
      val got = texts.select(
        TextAnalysis.posNgrams(TextAnalysis.tokens(col("text")), n)
          .as("native"),
        TextAnalysis.posNgramsHof(TextAnalysis.tokensHof(col("text")), n)
          .as("hof")).collect()
      got.foreach(r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"n=$n"))
    }
    // a null TOKEN inside the array (tokens() can't produce one, but the
    // kernel's contract is the HOF's): its windows drop, others survive
    val arr = spark.sql(
      "SELECT array('a', CAST(NULL AS STRING), 'b', 'c') AS tk")
    val r = arr.select(
      TextAnalysis.posNgrams(col("tk"), 2).as("native"),
      TextAnalysis.posNgramsHof(col("tk"), 2).as("hof")).head()
    assert(r.getSeq[String](0) === Seq("b c"))
    assert(r.getSeq[String](0) === r.getSeq[String](1))
  }

  test("charPolyHash and tokenFingerprint kernels == HOF folds; null " +
    "input → NULL") {
    val got = texts.select(
      TextAnalysis.charPolyHash(col("text")).as("n1"),
      TextAnalysis.charPolyHashHof(col("text")).as("h1"),
      TextAnalysis.tokenFingerprint(TextAnalysis.tokens(col("text"))).as("n2"),
      TextAnalysis.tokenFingerprintHof(TextAnalysis.tokensHof(col("text")))
        .as("h2")).collect()
    got.foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getLong(2) === r.getLong(3))
    }
    val nulls = spark.sql("SELECT CAST(NULL AS STRING) AS text").select(
      TextAnalysis.charPolyHash(col("text")).as("h"),
      TextAnalysis.tokenFingerprint(TextAnalysis.tokens(col("text"))).as("fp"))
      .head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("charNgramHashes kernel == charPolyHash over every codepoint " +
    "substring, for k = 1..13 including multibyte texts and short docs") {
    for (k <- Seq(1, 2, 3, 8, 12, 13)) {
      // executable spec: hash each k-codepoint substring independently
      val spec = transform(
        sequence(lit(1), greatest(length(col("text")) - (k - 1), lit(0))),
        i => TextAnalysis.charPolyHash(col("text").substr(i, lit(k))))
      val got = texts.select(
        TextKernels.charNgramHashesOf(col("text"), k).as("native"),
        when(length(col("text")) >= k, spec)
          .otherwise(array().cast("array<bigint>")).as("spec")).collect()
      got.foreach(r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"k=$k"))
    }
    // null text → NULL array (UnaryExpression null propagation)
    val n = spark.sql("SELECT CAST(NULL AS STRING) AS text")
      .select(TextKernels.charNgramHashesOf(col("text"), 3)).head()
    assert(n.isNullAt(0))
  }

  test("boundedLevenshtein == min(built-in levenshtein, d+1) on random " +
    "pairs and edge cases, for d = 0..4, and participates in codegen") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    val alphabet = "abcde 日本"
    def randStr(): String =
      Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length)))
        .mkString
    val pairs = Seq.fill(300)((randStr(), randStr())) ++ Seq(
      ("", ""), ("", "abc"), ("abc", ""), ("same", "same"),
      ("kitten", "sitting"), ("ab", "ba"), ("aaaa", "aa"),
      ("日本語", "日木語"))
    val df = pairs.toDF("a", "b")
    for (d <- 0 to 4) {
      val rows = df.select(
        graft.expressions.TextKernels
          .boundedLevenshteinOf(col("a"), col("b"), d).as("got"),
        least(levenshtein(col("a"), col("b")).cast("long"),
          lit(d + 1L)).as("want")).collect()
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1),
        s"d=$d mismatch: got ${r.getLong(0)} want ${r.getLong(1)}"))
    }
    // codegen participation (range source — a local relation would be
    // constant-folded away before any codegen happens)
    val plan = spark.range(8)
      .select(concat(lit("s"), col("id").cast("string")).as("a"),
        concat(lit("s"), ((col("id") + 1L) % 8L).cast("string")).as("b"))
      .select(graft.expressions.TextKernels
        .boundedLevenshteinOf(col("a"), col("b"), 2).as("x"))
    plan.collect()
    val s = plan.queryExecution.executedPlan.toString
    assert(s.linesIterator.exists(l =>
      l.contains("graft_bounded_levenshtein") && l.trim.startsWith("*")),
      s"kernel not codegen'd:\n$s")
  }

  test("tokens/shingles/charPolyHash participate in whole-stage codegen") {
    val df = spark.range(8).select(
        concat(lit("w"), col("id").cast("string"), lit(" x y w"),
          col("id").cast("string")).as("text"))
      .select(
        TextAnalysis.tokens(col("text")).as("tk"),
        TextAnalysis.ngramShingles(TextAnalysis.tokens(col("text")), 2).as("sg"),
        TextAnalysis.charPolyHash(col("text")).as("ph"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    Seq("graft_tokens", "graft_shingles", "graft_char_poly_hash").foreach { fn =>
      assert(plan.linesIterator.exists(l =>
        l.contains(fn) && l.trim.startsWith("*")), s"$fn not codegen'd:\n$plan")
    }
  }
}
