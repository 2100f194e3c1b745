package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Tokenizer / shingle / fingerprint edge cases. */
class TextAnalysisSpec extends SparkSpec {

  private def shingles(s: String): Seq[String] = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(TextAnalysis.bigramShingles(TextAnalysis.tokens(col("t"))))
      .head().getSeq[String](0)
  }

  test("tokens drop empty strings from repeated/trailing spaces") {
    import spark.implicits._
    val tk = Seq("  a  b c ").toDF("t")
      .select(TextAnalysis.tokens(col("t"))).head().getSeq[String](0)
    assert(tk === Seq("a", "b", "c"))
  }

  test("bigramShingles: order, dedup, and degenerate inputs") {
    assert(shingles("a b c") === Seq("a b", "b c"))
    assert(shingles("a b a b") === Seq("a b", "b a")) // distinct
    assert(shingles("solo") === Seq.empty)
    assert(shingles("") === Seq.empty)
  }

  test("ngramShingles generalizes the fold: n=1 distinct tokens, n=3 " +
    "sliding trigrams, incomplete tails dropped") {
    import spark.implicits._
    def ngrams(s: String, n: Int): Seq[String] =
      Seq(s).toDF("t")
        .select(TextAnalysis.ngramShingles(TextAnalysis.tokens(col("t")), n))
        .head().getSeq[String](0)
    assert(ngrams("a b c d e", 3) === Seq("a b c", "b c d", "c d e"))
    assert(ngrams("a b a b a", 1) === Seq("a", "b"))
    assert(ngrams("a b", 3) === Seq.empty)  // shorter than the grain
    assert(ngrams("", 3) === Seq.empty)
    assert(ngrams("a b c", 2) === shingles("a b c")) // bigram = n=2 instance
  }

  test("charPolyHash matches a manual fold") {
    import spark.implicits._
    val got = Seq("abc").toDF("t")
      .select(TextAnalysis.charPolyHash(col("t"))).head().getLong(0)
    val want = "abc".foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    assert(got === want)
  }

  test("qualityFeatures: zero-token text scores 0.0 with NULL ratios") {
    import spark.implicits._
    val r = Seq("   ").toDF("t")
      .select(TextAnalysis.qualityFeatures(col("t"), Seq("the")).as("q"))
      .select("q.n_tokens", "q.ttr", "q.quality_score").head()
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1))
    assert(r.getDouble(2) === 0.0)
  }

  test("predictedLang: ties resolve in marker order, no markers -> first lang wins only on all-zero tie") {
    import spark.implicits._
    def predict(s: String): String =
      Seq(s).toDF("t")
        .select(TextAnalysis.predictedLang(
          TextAnalysis.langScores(TextAnalysis.tokens(col("t"))))).head().getString(0)
    assert(predict("the a of") === "en")
    assert(predict("join query group") === "zh")
    // all scores 0 → every "is >= all others" holds → first in order: en
    assert(predict("xyzzy") === "en")
  }

  test("redactPii replaces emails and 6+ digit runs, leaves short " +
    "numbers and plain text alone") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val texts = Seq(
      "mail me at a.b-c%d@sub.example.co today",
      "order 12345 ok but 123456 and 9876543210 are ids",
      "no pii here",
      "two mails x@y.io and z@w.org")
      .toDF("text")
    val got = texts.select(TextAnalysis.redactPii(col("text")))
      .as[String].collect().toSeq
    assert(got === Seq(
      "mail me at <EMAIL> today",
      "order 12345 ok but <NUM> and <NUM> are ids",
      "no pii here",
      "two mails <EMAIL> and <EMAIL>"))
  }
}
