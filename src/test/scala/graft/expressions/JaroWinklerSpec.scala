package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the Jaro-Winkler kernel: the classic Winkler paper examples
  * (exact doubles, verified against DuckDB's jaro_winkler_similarity —
  * the q173 oracle function), byte-level semantics on non-ASCII, the
  * boost gate at jaro ≤ 0.7, and interpreted/codegen agreement through
  * a DataFrame evaluation. */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.jaroWinkler(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic Winkler examples match the oracle function bit-exactly") {
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("dixon", "dicksonx") === 0.8133333333333332)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("abc", "xyz") === 0.0)
  }

  test("boost gates at jaro <= 0.7: crate/trace keeps its raw jaro") {
    // jaro(crate, trace) = 0.7333... > 0.7 BUT shares no prefix →
    // boost multiplies by prefix 0 and the value is unchanged
    assert(jw("crate", "trace") === 0.7333333333333334)
  }

  test("byte-level semantics on non-ASCII (DuckDB parity)") {
    // 'é' is two UTF-8 bytes: lengths 5 vs 4 at the byte level
    assert(jw("café", "cafe") === 0.8483333333333334)
  }

  test("both-empty is 1.0 (definitional; documented DuckDB divergence)") {
    assert(jw("", "") === 1.0)
    assert(jw("", "a") === 0.0)
  }

  test("column surface evaluates through codegen identically") {
    val s = spark
    import s.implicits._
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("café", "cafe"), ("same", "same"))
      .toDF("a", "b")
      .withColumn("jw", JaroWinkler.jaroWinklerOf(col("a"), col("b")))
    val got = df.collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(got("martha") === 0.9611111111111111)
    assert(got("dixon") === 0.8133333333333332)
    assert(got("café") === 0.8483333333333334)
    assert(got("same") === 1.0)
  }

  test("agrees with a code-point reference on ASCII randoms") {
    // independent reference: code-point implementation over ASCII-only
    // strings (where byte and code-point semantics coincide)
    def ref(s1: String, s2: String): Double = {
      val (n, m) = (s1.length, s2.length)
      if (n == 0 && m == 0) return 1.0
      if (n == 0 || m == 0) return 0.0
      val window = math.max(0, math.max(n, m) / 2 - 1)
      val ma = Array.fill(n)(false); val mb = Array.fill(m)(false)
      var matches = 0
      for (i <- 0 until n) {
        val lo = math.max(0, i - window); val hi = math.min(m - 1, i + window)
        var j = lo; var done = false
        while (j <= hi && !done) {
          if (!mb(j) && s1(i) == s2(j)) {
            ma(i) = true; mb(j) = true; matches += 1; done = true
          }
          j += 1
        }
      }
      if (matches == 0) return 0.0
      var t = 0; var j = 0
      for (i <- 0 until n) if (ma(i)) {
        while (!mb(j)) j += 1
        if (s1(i) != s2(j)) t += 1
        j += 1
      }
      t /= 2
      val md = matches.toDouble
      val jaro = (md / n + md / m + (md - t) / md) / 3.0
      if (jaro <= 0.7) jaro
      else {
        val lim = math.min(4, math.min(n, m))
        var p = 0
        while (p < lim && s1(p) == s2(p)) p += 1
        jaro + p * 0.1 * (1.0 - jaro)
      }
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val a = rnd.alphanumeric.take(rnd.nextInt(10)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(10)).mkString
      assert(jw(a, b) === ref(a, b), s"mismatch on ($a, $b)")
    }
  }
}
