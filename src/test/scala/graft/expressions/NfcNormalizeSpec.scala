package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NFC kernel semantics: canonical composition, idempotence, NULL.
  * All non-ASCII literals are written as explicit \\u escapes so the
  * decomposed/composed distinction survives any editor normalization. */
class NfcNormalizeSpec extends SparkSpec {

  private val decomposedE = "cafe\u0301" // e + combining acute
  private val composedE = "caf\u00e9"    // precomposed e-acute
  private val jamo = "\u1100\u1161"       // Hangul choseong kiyeok + a
  private val syllable = "\uac00"         // precomposed syllable

  test("composes decomposed sequences to their canonical forms " +
    "(Latin combining marks and Hangul jamo), leaves NFC text unchanged, " +
    "and is idempotent") {
    import spark.implicits._
    assert(decomposedE != composedE && jamo != syllable) // distinct bytes
    val df = Seq(decomposedE, composedE, jamo, syllable, "plain ascii", "")
      .toDF("s")
      .select(col("s"), NfcNormalize.nfc(col("s")).as("n"))
    val rows = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows(decomposedE) === composedE)
    assert(rows(composedE) === composedE)
    assert(rows(jamo) === syllable)
    assert(rows(syllable) === syllable)
    assert(rows("plain ascii") === "plain ascii")
    assert(rows("") === "")
    // idempotence: normalizing the normalized column is a fixed point
    val twice = Seq(decomposedE, jamo).toDF("s")
      .select(NfcNormalize.nfc(NfcNormalize.nfc(col("s"))).as("n2"),
        NfcNormalize.nfc(col("s")).as("n1"))
      .collect()
    twice.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("NULL input yields NULL") {
    import spark.implicits._
    val rows = Seq(Option.empty[String]).toDF("s")
      .select(NfcNormalize.nfc(col("s"))).collect()
    assert(rows(0).isNullAt(0))
  }
}
