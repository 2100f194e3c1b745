package graft.expressions

import graft.SparkSpec
import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native signature kernels vs the HOF spellings they replace — the
  * parity contract that lets q16/q17/q26 swap engines without changing a
  * single output row — plus the charPolyHash mirror for the poly family
  * and codegen-participation checks. */
class SignatureKernelsSpec extends SparkSpec {

  // random word-ish corpus with empties, repeats, and non-ASCII (incl. a
  // surrogate-pair emoji — codepoint vs UTF-16-unit hashing would diverge)
  private def corpus: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val words = Vector("the", "quick", "brown", "fox", "naïve", "日本語",
      "\uD83D\uDE00", "zebra", "qq", "")
    (0 until 80).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("minhash kernel == HOF aggregate/zip_with spelling, component for " +
    "component, over shingled real-ish text") {
    val sh = corpus.select(
      TextAnalysis.bigramShingles(TextAnalysis.tokens(col("text"))).as("sh"))
    val got = sh.select(
      Dedup.minhashSignature(col("sh"), 64).as("native"),
      Dedup.minhashSignatureHof(col("sh"), 64).as("hof")).collect()
    got.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    assert(got.length === 80)
  }

  test("simhash kernel == HOF 64-slot vote spelling on the same tokens") {
    val tk = corpus.select(TextAnalysis.tokens(col("text")).as("tk"))
    val got = tk.select(
      Dedup.simhash64(col("tk")).as("native"),
      Dedup.simhash64Hof(col("tk")).as("hof")).collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("null/empty edges: NULL array → NULL; empty array → all-MaxValue " +
    "minhash, zero simhash; null ELEMENT matches the HOF null semantics") {
    import spark.implicits._
    val df = Seq((1L, Some(Seq[String]())), (2L, None))
      .toDF("id", "arr")
    val rows = df.select(
      Dedup.minhashSignature(col("arr"), 4).as("mh"),
      Dedup.simhash64(col("arr")).as("sh")).orderBy(col("id")).collect()
    assert(rows(0).getSeq[Long](0) === Seq.fill(4)(Long.MaxValue))
    assert(rows(0).getLong(1) === 0L) // all votes negative → no bits set
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    // a null element: HOF xxhash64(seed, NULL) leaves the seed unchanged;
    // kernels must agree (simhash: token hashes to the bare seed 42)
    val withNull = spark.sql(
      "SELECT array('a', CAST(NULL AS STRING), 'b') AS arr")
    val p = withNull.select(
      Dedup.minhashSignature(col("arr"), 8).as("n"),
      Dedup.minhashSignatureHof(col("arr"), 8).as("h"),
      Dedup.simhash64(col("arr")).as("ns"),
      Dedup.simhash64Hof(col("arr")).as("hs")).head()
    assert(p.getSeq[Long](0) === p.getSeq[Long](1))
    assert(p.getLong(2) === p.getLong(3))
  }

  test("poly-minhash kernel == the mirrorable Column spelling " +
    "(min of (a*charPolyHash+b) mod p per component)") {
    val (as, bs) = SignatureKernels.polyCoeffs(16)
    val sh = corpus.select(
      TextAnalysis.bigramShingles(TextAnalysis.tokens(col("text"))).as("sh"))
      .where(size(col("sh")) > 0)
    // reference spelling: numHashes interpreted passes of
    // array_min(transform(...)) — exactly the per-component definition
    val ref = array((0 until 16).map { j =>
      array_min(transform(col("sh"), s =>
        (lit(as(j)) * TextAnalysis.charPolyHash(s) + lit(bs(j)))
          % lit(SignatureKernels.PolyMod)))
    }: _*)
    val got = sh.select(
      Dedup.polyMinhashSignature(col("sh"), 16).as("native"), ref.as("ref"))
      .collect()
    got.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    assert(got.nonEmpty)
  }

  test("polyHash kernel == charPolyHash Column on unicode, empty, and " +
    "ASCII strings") {
    import spark.implicits._
    val df = Seq("", "a", "abc xyz", "naïve", "日本語テキスト", "\uD83D\uDE00!",
      "mixed 日本 and \uD83D\uDE01 tail").toDF("s")
    val got = df.select(col("s"), TextAnalysis.charPolyHash(col("s")).as("h"))
      .collect()
    got.foreach { r =>
      assert(SignatureKernels.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))
        === r.getLong(1), s"mismatch on '${r.getString(0)}'")
    }
  }

  test("poly-simhash: 60-bit range, empty/null edges, and agreement with " +
    "a per-bit reference over the two poly token hashes") {
    import spark.implicits._
    val got = corpus.select(col("text"),
      Dedup.polySimhash64(TextAnalysis.tokens(col("text"))).as("fp")).collect()
    got.foreach { r =>
      val fp = r.getLong(1)
      assert(fp >= 0L && fp < (1L << 60))
      // reference: recompute per-bit votes from the scalar kernels
      val toks = r.getString(0).split(" ").filter(_.nonEmpty)
      val want = (0 until 60).map { j =>
        val v = toks.map { t =>
          val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
          val h = SignatureKernels.polyHashM(u, 31L, SignatureKernels.PolyMod) |
            (SignatureKernels.polyHashM(u, SignatureKernels.PolyMult2,
              SignatureKernels.PolyMod2) << 30)
          if (((h >>> j) & 1L) == 1L) 1 else -1
        }.sum
        if (v > 0) 1L << j else 0L
      }.sum
      assert(fp === want)
    }
    val edges = Seq((1L, Some(Seq[String]())), (2L, None)).toDF("id", "arr")
      .select(Dedup.polySimhash64(col("arr"))).orderBy(lit(1)).collect()
    assert(edges.exists(r => !r.isNullAt(0) && r.getLong(0) == 0L))
    assert(edges.exists(_.isNullAt(0)))
  }

  test("all four kernels participate in whole-stage codegen") {
    val df = spark.range(8).select(
        transform(sequence(lit(0L), lit(3L)),
          i => concat(lit("w"), (i + col("id")).cast("string"))).as("arr"))
      .select(
        Dedup.minhashSignature(col("arr"), 8).as("mh"),
        Dedup.simhash64(col("arr")).as("sh"),
        Dedup.polyMinhashSignature(col("arr"), 8).as("pm"),
        Dedup.polySimhash64(col("arr")).as("ps"))
    df.collect() // must execute, not just plan
    val plan = df.queryExecution.executedPlan.toString
    Seq("graft_minhash", "graft_simhash", "graft_poly_minhash",
        "graft_poly_simhash").foreach { fn =>
      assert(plan.linesIterator.exists(l =>
        l.contains(fn) && l.trim.startsWith("*")), s"$fn not codegen'd:\n$plan")
    }
  }
}
