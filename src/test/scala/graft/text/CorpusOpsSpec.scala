package graft.text

import graft.SparkSpec

/** Decontamination matching semantics and chunk window arithmetic. */
class CorpusOpsSpec extends SparkSpec {

  test("affinityScore: hand-computed smoothed integer weights, per-doc " +
    "means, above-corpus-mean selection, and the zero-token row") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "aa", "en"),   // target
      (2L, "aa", "de"),
      (3L, "bb", "de"),
      (4L, "", "de"))     // zero tokens
      .toDF("doc_id", "text", "lang")
    // bucket(aa): r=2, t=1 -> w = (1+1)*1e6 // (2+2) = 500000
    // bucket(bb): r=1, t=0 -> w = (0+1)*1e6 // (1+2) = 333333
    // affinities: d1=500000 d2=500000 d3=333333 d4=0
    // mean*4 = 1333333; selected iff affinity*4 >= 1333333
    val out = CorpusOps.affinityScore(docs, "doc_id", "text",
        col("lang") === "en", buckets = 512)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      1L -> ((1L, 500000L, 1L)),
      2L -> ((1L, 500000L, 1L)),
      3L -> ((1L, 333333L, 0L)),
      4L -> ((0L, 0L, 0L))))
  }

  test("affinityScore separates target-heavy documents: a doc written in " +
    "target-dominant tokens outranks one written in non-target tokens") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = (1L to 20L).map { i =>
      val target = i <= 8
      val tok = if (target) "alpha" else "beta"
      // everyone shares some 'common' tokens; the tail is class-specific
      (i, s"common common $tok $tok $tok", if (target) "en" else "de")
    }.toDF("doc_id", "text", "lang")
    val out = CorpusOps.affinityScore(docs, "doc_id", "text",
        col("lang") === "en", buckets = 512)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val (tgt, non) = out.partition(_._1 <= 8L)
    assert(tgt.map(_._2).min > non.map(_._2).max,
      s"target docs must outscore non-target: $out")
    assert(tgt.forall(_._3 == 1L) && non.forall(_._3 == 0L))
  }

  test("decontaminate drops exactly the train docs sharing an n-gram " +
    "with the eval set") {
    import spark.implicits._
    val train = Seq(
      (1L, "the model was trained on web data"),
      (2L, "completely unrelated content here today"),
      (3L, "the model was evaluated separately"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, "benchmarks say the model was trained well"))
      .toDF("doc_id", "text")
    // trigrams of doc 1 include "the model was" and "model was trained" —
    // both present in eval; doc 3 shares only "the model was"; doc 2 none
    val kept = CorpusOps.decontaminate(train, eval, "doc_id", "text", n = 3)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L))
    // with 4-grams, doc 3 no longer matches ("the model was evaluated")
    val kept4 = CorpusOps.decontaminate(train, eval, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(kept4 === Set(2L, 3L))
  }

  test("noveltyDiversity: hand-computed novelty and Gini-Simpson on a " +
    "tiny corpus, zero-token edge included") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"),       // bigrams: "a b","b c" — "a b" shared with doc 2
      (2L, "a b d"),       // bigrams: "a b","b d"
      (3L, "x x x x"),     // bigrams: {"x x"} (distinct); tokens 4×x
      (4L, ""))            // zero tokens
      .toDF("doc_id", "text")
    val got = CorpusOps.noveltyDiversity(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    // doc 1: shingles {"a b"(df2), "b c"(df1)} → novelty 1/2; tokens all
    // distinct → gini = 1 − 3/9
    assert(got(1L)._1 === 3L && got(1L)._2 === 2L && got(1L)._3 === 1L)
    assert(math.abs(got(1L)._4 - 0.5) < 1e-15)
    assert(math.abs(got(1L)._5 - (1.0 - 3.0 / 9.0)) < 1e-15)
    // doc 3: one distinct shingle "x x", unique corpus-wide → novelty 1;
    // tokens 4×"x" → gini = 1 − 16/16 = 0
    assert(got(3L) === ((4L, 1L, 1L, 1.0, 0.0)))
    // doc 4: all zeros, no NULLs
    assert(got(4L) === ((0L, 0L, 0L, 0.0, 0.0)))
  }

  test("decontaminateBloom is row-identical to the exact path on a " +
    "generated corpus, and the gate actually prunes postings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 200 train docs over a small vocabulary so contamination is common
    // but not universal; 20 eval docs
    val rnd = new scala.util.Random(11)
    def sentence() = (1 to 8).map(_ => s"w${rnd.nextInt(40)}").mkString(" ")
    val train = (1L to 200L).map(i => (i, sentence())).toDF("doc_id", "text")
    val eval = (1L to 20L).map(i => (1000L + i, sentence()))
      .toDF("doc_id", "text")
    val exact = CorpusOps.decontaminate(train, eval, "doc_id", "text", n = 3)
      .collect().map(_.getLong(0)).toSet
    val bloomed = CorpusOps.decontaminateBloom(
        train, eval, "doc_id", "text", n = 3, capacity = 1L << 12)
      .collect().map(_.getLong(0)).toSet
    assert(bloomed === exact)
    assert(exact.nonEmpty && exact.size < 200) // both regimes exercised
    // the gate prunes: gated postings < total postings (here contamination
    // is dense, so just assert the bloom rejects SOMETHING on disjoint data)
    val clean = Seq((1L, "xx yy zz aa bb cc")).toDF("doc_id", "text")
    val keptClean = CorpusOps.decontaminateBloom(
        clean, eval, "doc_id", "text", n = 3)
      .collect().map(_.getLong(0)).toSet
    assert(keptClean === Set(1L))
  }

  test("BloomMightContainLong: codegen probe matches the sketch, " +
    "no false negatives, nulls stay null") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val keys = (1L to 500L).map(_ * 7919L)
    val bloom = keys.toDF("h").stat.bloomFilter("h", 1000L, 0.01)
    val probe = ((1L to 500L).map(k => (k * 7919L, true)) ++
      Seq((-1L, false))) // -1 may or may not collide; just check inserted keys
      .toDF("h", "inserted")
    val got = probe.select(col("h"), col("inserted"),
      graft.expressions.BloomMightContainLong.mightContain(col("h"), bloom)
        .as("hit")).collect()
    // every inserted key MUST hit (no false negatives)
    assert(got.filter(_.getBoolean(1)).forall(_.getBoolean(2)))
    // null input → null output
    val nullRow = Seq(Tuple1(Option.empty[Long])).toDF("h")
      .select(graft.expressions.BloomMightContainLong.mightContain(
        col("h"), bloom)).collect().head
    assert(nullRow.isNullAt(0))
  }

  test("topAdjacentPair: most frequent pair with (count desc, pair asc) " +
    "tie-break; bpeMergeStep merges greedily left-to-right, overlapping " +
    "runs consume pairwise") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "a b a b c"), (2L, "a b x"), (3L, ""))
      .toDF("doc_id", "text")
    assert(CorpusOps.topAdjacentPair(docs, "doc_id", "text") ===
      Some(("a", "b", 3L)))
    val merged = CorpusOps.bpeMergeStep(docs, "doc_id", "text", "a", "b")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(merged(1L) === List("a b", "a b", "c"))
    assert(merged(2L) === List("a b", "x"))
    assert(merged(3L) === Nil)
    // overlapping same-token runs: greedy consumes pairwise
    val runs = Seq((1L, "a a a")).toDF("doc_id", "text")
    assert(CorpusOps.bpeMergeStep(runs, "doc_id", "text", "a", "a")
      .collect().head.getSeq[String](1).toList === List("a a", "a"))
    // a genuine count tie: (a,b) and (b,a) once each — pair-asc decides
    val tie = Seq((1L, "b a"), (2L, "a b")).toDF("doc_id", "text")
    assert(CorpusOps.topAdjacentPair(tie, "doc_id", "text") ===
      Some(("a", "b", 1L))) // counts equal, pair-asc picks (a,b)
  }

  test("chunkDocuments: stride windows, short final window, empty docs " +
    "emit nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")),
      (2L, "a b"),
      (3L, ""))
      .toDF("doc_id", "text")
    val got = CorpusOps.chunkDocuments(docs, "doc_id", "text",
        chunkSize = 12, stride = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = got.groupBy(_._1)
    // doc 1: starts 0, 8, 16 → lengths 12, 12, 4
    assert(byDoc(1L).map(c => c._2 -> c._3).toSet ===
      Set(0L -> 12L, 1L -> 12L, 2L -> 4L))
    assert(byDoc(1L).find(_._2 == 2L).get._4 === "t17 t18 t19 t20")
    // doc 2: one window of 2 tokens
    assert(byDoc(2L).map(c => (c._2, c._3, c._4)).toSeq === Seq((0L, 2L, "a b")))
    // doc 3: no output
    assert(!byDoc.contains(3L))
  }

  test("mixtureSample: per-group permille rates via the content hash — " +
    "reproducible, group-targeted, 0 drops all, 1000 keeps all") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = (0 until 300).map(i => (i.toLong,
      if (i % 3 == 0) "keepall" else if (i % 3 == 1) "dropall" else "half",
      s"document number $i with content"))
      .toDF("doc_id", "source", "text")
    val got = CorpusOps.mixtureSample(docs, "text", "source",
      Map("keepall" -> 1000, "dropall" -> 0), defaultPermille = 500)
    val bySrc = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.getOrElse("keepall", 0L) === 100L)
    assert(!bySrc.contains("dropall"))
    val half = bySrc.getOrElse("half", 0L)
    assert(half > 20L && half < 80L, s"half-rate kept $half of 100")
    // reproducible: the same call yields the same kept set
    val again = CorpusOps.mixtureSample(docs, "text", "source",
      Map("keepall" -> 1000, "dropall" -> 0), defaultPermille = 500)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === got.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("tfidfTopTerms: rare terms outscore common ones; ties break by " +
    "term; topK truncates") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "common rare common"),   // tf(common)=2, tf(rare)=1
      (2L, "common other"),
      (3L, "common zebra"))
      .toDF("doc_id", "text")
    val got = CorpusOps.tfidfTopTerms(docs, "doc_id", "text", topK = 2)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("term"),
        r.getAs[Long]("tf"), r.getAs[Long]("df"),
        r.getAs[Double]("score"), r.getAs[Long]("rank")))
    val doc1 = got.filter(_._1 == 1L).sortBy(_._6)
    // "rare": tf 1, df 1 → score 1*(3/1)=3; "common": tf 2, df 3 → 2*(3/3)=2
    assert(doc1.map(t => (t._2, t._5, t._6)).toSeq ===
      Seq(("rare", 3.0, 1L), ("common", 2.0, 2L)))
    // doc 2: "other" (3.0) then "common" (1.0)
    val doc2 = got.filter(_._1 == 2L).sortBy(_._6)
    assert(doc2.map(t => (t._2, t._6)).toSeq ===
      Seq(("other", 1L), ("common", 2L)))
    // equal scores tie-break by term asc: give doc 4 two singleton terms
    val tied = CorpusOps.tfidfTopTerms(
      Seq((4L, "bbb aaa")).toDF("doc_id", "text"), "doc_id", "text", 2)
      .orderBy(col("rank")).collect().map(_.getAs[String]("term")).toSeq
    assert(tied === Seq("aaa", "bbb"))
  }

  test("repetitionSignals: multiplicity bigrams, duplicate fraction, " +
    "top-bigram coverage; sub-2-token docs report zeros") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"),        // bigrams: "a a"×3 → dup 2/3, top frac 6/4
      (2L, "x y x y"),        // "x y"×2, "y x"×1 → dup 1/3, top 4/4
      (3L, "solo"),
      (4L, ""))
      .toDF("doc_id", "text")
    val got = CorpusOps.repetitionSignals(docs, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_bigrams"),
          r.getAs[Long]("n_distinct_bigrams"), r.getAs[Long]("top_bigram_n"),
          r.getAs[Double]("dup_bigram_frac"),
          r.getAs[Double]("top_bigram_frac")))).toMap
    assert(got(1L) === ((4L, 3L, 1L, 3L, 2.0 / 3.0, 6.0 / 4.0)))
    assert(got(2L) === ((4L, 3L, 2L, 2L, 1.0 / 3.0, 4.0 / 4.0)))
    assert(got(3L) === ((1L, 0L, 0L, 0L, 0.0, 0.0)))
    assert(got(4L) === ((0L, 0L, 0L, 0L, 0.0, 0.0)))
  }

  test("packSequences: per-block running offsets cut at the budget; a doc " +
    "starting before the boundary stays in its bin; zero-token docs hold " +
    "position without consuming budget") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b1", "t1 t2 t3"),     // 3 tokens, offset 0 → bin 0
      (2L, "b1", "t1 t2"),        // offset 3 → bin 0 (crosses 4? budget 4)
      (3L, "b1", ""),             // offset 5, zero tokens → bin 1
      (4L, "b1", "t1"),           // offset 5 → bin 1
      (5L, "b2", "t1 t2 t3 t4 t5"), // independent block: offset 0 → bin 0
      (6L, "b2", "t1"))           // offset 5 → bin 1
      .toDF("doc_id", "blk", "text")
    val got = CorpusOps.packSequences(docs, "doc_id", "text", Seq("blk"),
        budget = 4L)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("start_offset"),
          r.getAs[Long]("bin")))).toMap
    assert(got(1L) === ((3L, 0L, 0L)))
    assert(got(2L) === ((2L, 3L, 0L))) // starts at 3 < 4 → bin 0
    assert(got(3L) === ((0L, 5L, 1L)))
    assert(got(4L) === ((1L, 5L, 1L)))
    assert(got(5L) === ((5L, 0L, 0L)))
    assert(got(6L) === ((1L, 5L, 1L)))
  }

  test("termCooccurrence counts document-level pair presence with exact " +
    "lift = n_ab*N/(n_a*n_b)") {
    import spark.implicits._
    // 4 docs; (alpha,beta) co-occur in 2, alpha df=3, beta df=2, N=4
    val docs = Seq(
      (1L, "alpha beta noise"),
      (2L, "alpha beta"),
      (3L, "alpha gamma"),
      (4L, "gamma delta")).toDF("doc_id", "text")
    val out = CorpusOps.termCooccurrence(docs, "doc_id", "text",
      minDf = 2L, maxDfPermille = 1000L, perDocTerms = 10, minSupport = 2L)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // only (alpha,beta) reaches support 2; gamma pairs have n_ab=1,
    // noise/delta fail minDf
    assert(out.keySet === Set(("alpha", "beta")))
    assert(out(("alpha", "beta")) === ((2L, 3L, 2L, 2.0 * 4 / (3 * 2))))
  }

  test("termCooccurrence caps: df-cap drops stopwords, per-doc cap keeps " +
    "the RAREST terms, duplicate tokens count presence once") {
    import spark.implicits._
    // "stop" is in every doc (df 3/3 > 600 permille); doc 1 repeats
    // "rare1" — presence still 1; per-doc cap 2 keeps the two rarest of
    // {rare1 df2, rare2 df2, mid df3→capped}
    val docs = Seq(
      (1L, "stop rare1 rare1 rare2 mid"),
      (2L, "stop rare1 rare2 mid"),
      (3L, "stop mid")).toDF("doc_id", "text")
    val out = CorpusOps.termCooccurrence(docs, "doc_id", "text",
      minDf = 2L, maxDfPermille = 700L, perDocTerms = 2, minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // eligible: rare1(2), rare2(2), mid(3·1000 ≤ 700·3? 3000>2100 → no)
    // per-doc rarest-2 of docs 1,2 = {rare1, rare2} → one pair, n_ab=2
    assert(out === Set(("rare1", "rare2", 2L)))
  }

  test("dupSpans: duplicated-position share and longest run on a " +
    "hand-built corpus; short docs absent; within-doc repeats don't count") {
    import spark.implicits._
    // doc 1 and doc 2 share the 5-token span "a b c d e" → trigram
    // positions 0..2 duplicated in both (run of 3); doc 1's tail "x y z"
    // is unique. doc 3 repeats its own trigram twice but no other doc
    // has it → NOT duplicated (cross-doc only). doc 4 is too short for
    // any trigram → absent from the output.
    val docs = Seq(
      (1L, "a b c d e x y z"),
      (2L, "p q a b c d e"),
      (3L, "m n o m n o"),
      (4L, "t u"))
      .toDF("doc_id", "text")
    val got = CorpusOps.dupSpans(docs, "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))))
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    // doc 1: 6 trigram positions, 3 duplicated (a b c, b c d, c d e)
    assert(got(1L) === ((6L, 3L, 0.5d, 3L)))
    // doc 2: 5 positions, duplicated at 2..4 → run 3
    assert(got(2L) === ((5L, 3L, 0.6d, 3L)))
    // doc 3: 4 positions, zero duplicated, max_run 0
    assert(got(3L) === ((4L, 0L, 0.0d, 0L)))
  }

  test("dupSpans: a non-contiguous duplicated set yields max_run = " +
    "longest island, not the total") {
    import spark.implicits._
    // doc 1 shares "a b c" (pos 0) and "x y z" (pos 4) with others,
    // positions 1..3 unique → two islands of 1, max_run 1, n_dup 2
    val docs = Seq(
      (1L, "a b c k1 x y z"),
      (2L, "a b c k2"),
      (3L, "k3 x y z"))
      .toDF("doc_id", "text")
    val got = CorpusOps.dupSpans(docs, "doc_id", "text", n = 3)
      .where($"doc_id" === 1L).collect().head
    assert(got.getLong(1) === 5L)   // positions
    assert(got.getLong(2) === 2L)   // duplicated
    assert(got.getLong(4) === 1L)   // max island
  }

  test("chi2Terms: matches the naive 2x2 contingency computation and " +
    "keeps only positively-associated terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "cat cat dog"),   // presence: cat, dog
      (2L, "en", "cat bird"),
      (3L, "en", "dog"),
      (4L, "fr", "chien chat"),
      (5L, "fr", "chat dog"),
      (6L, "fr", "bird chat"))
      .toDF("doc_id", "lang", "text")
    val rows = Seq(
      (1L, Set("cat", "dog")), (2L, Set("cat", "bird")), (3L, Set("dog")),
      (4L, Set("chien", "chat")), (5L, Set("chat", "dog")),
      (6L, Set("bird", "chat")))
    val classes = Map(1L -> "en", 2L -> "en", 3L -> "en",
      4L -> "fr", 5L -> "fr", 6L -> "fr")
    val nDocs = rows.size
    val terms = rows.flatMap(_._2).distinct
    val naive = (for (cl <- Seq("en", "fr"); tm <- terms) yield {
      val a = rows.count { case (id, ts) => classes(id) == cl && ts(tm) }
      val nT = rows.count { case (_, ts) => ts(tm) }
      val nC = rows.count { case (id, _) => classes(id) == cl }
      val (b, c, d) = (nT - a, nC - a, nDocs - nT - nC + a)
      val diff = (a.toLong * d - b.toLong * c).toDouble
      val chi2 = nDocs.toDouble * (diff / ((a + b).toLong * (c + d))) *
        (diff / ((a + c).toLong * (b + d)))
      (cl, tm, a, diff, chi2)
    }).filter(_._4 > 0)
      .groupBy(_._1)
      .flatMap { case (_, g) =>
        g.sortBy(x => (-x._5, x._2)).take(2)
          .map(x => (x._1, x._2, x._3.toLong, x._5))
      }.toSet
    val got = CorpusOps.chi2Terms(docs, "doc_id", "lang", "text", topK = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === naive)
    // "cat" appears only in en docs, "chat" only in fr — each must top
    // its class
    assert(got.exists(x => x._1 == "en" && x._2 == "cat"))
    assert(got.exists(x => x._1 == "fr" && x._2 == "chat"))
  }

  test("tfidfCosinePairs: verbatim duplicates score cosine 1.0, " +
    "term-disjoint docs never pair, and the df-cap silences boilerplate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val a = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      1L -> a, 2L -> a, // exact duplicates
      3L -> "eta theta iota kappa lambda mu", // term-disjoint from 1/2
      4L -> "alpha beta gamma nu xi omicron") // shares a prefix with 1/2
      .toDF("doc_id", "text")
    val out = CorpusOps.tfidfCosinePairs(docs, "doc_id", "text",
      ngram = 2, minDf = 1L, maxDfPermille = 1000L, minShared = 1L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(4), r.getLong(5))).toMap
    // identical weight vectors: dot = |a||b| exactly, cos renders 1.0,
    // and the integer gate key hits exactly 10^9 (dot = lo = hi makes
    // both staged floors exact)
    assert(out((1L, 2L))._2 === 1.0)
    assert(out((1L, 2L))._3 === 1000000000L)
    assert(out((1L, 2L))._1 === 5L) // 5 bigrams shared
    assert(!out.contains((1L, 3L)) && !out.contains((2L, 3L)))
    // 1-4 share exactly the bigrams "alpha beta" and "beta gamma"
    assert(out((1L, 4L))._1 === 2L)
    assert(out((1L, 4L))._2 > 0.0 && out((1L, 4L))._2 < 1.0)
    // the key is cos^2 in nano-units, within its documented [0,2)
    // staged-floor slack of the float cosine the operator also emits
    val (_, cos14, key14) = out((1L, 4L))
    assert(key14 > 0L && key14 < 1000000000L)
    assert(math.abs(cos14 * cos14 * 1e9 - key14) < 3.0)
    // a df-cap at 500 permille kills terms present in >2 of 4 docs: the
    // shared-prefix bigrams (df=3) vanish, so pair (1,4) disappears but
    // the duplicate pair (terms at df=2) survives
    val capped = CorpusOps.tfidfCosinePairs(docs, "doc_id", "text",
      ngram = 2, minDf = 1L, maxDfPermille = 500L, minShared = 1L)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((1L, 2L)))
  }

  test("gopherRules: each rule rejects its construction, zero-token docs " +
    "zero out, and keep is the conjunction") {
    import spark.implicits._
    val docs = Seq(
      // 4 tokens, sum length 15 (avg in [2,8]), one stopword, max_tf 1
      // → every rule passes
      1L -> "the word some text",
      2L -> "", // zero tokens: all features 0, keep 0
      3L -> "xx xx xx xx", // repetition: max_tf 4 of 4 > 1/2 share
      4L -> "the supercalifragilisticexpialidocious words here", // avg > 8
      5L -> "zz yy ww vv") // no stopword
      .toDF("doc_id", "text")
    val out = CorpusOps.gopherRules(docs, "doc_id", "text",
        stopwords = Seq("the", "a", "of"), minTokens = 3L, maxTokens = 10L,
        minAvgLen = 2L, maxAvgLen = 8L, minStop = 1L,
        maxTopShareNum = 1L, maxTopShareDen = 2L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getLong(8), r.getLong(9))).toMap
    assert(out(1L) === ((4L, 1L, 1L, 1L, 1L, 1L))) // all rules pass
    assert(out(2L) === ((0L, 0L, 0L, 0L, 1L, 0L))) // 0·den <= 0·num holds
    assert(out(3L)._5 === 0L && out(3L)._6 === 0L) // repetition fails
    assert(out(4L)._3 === 0L && out(4L)._6 === 0L) // avg-len fails
    assert(out(5L)._4 === 0L && out(5L)._6 === 0L) // stopword fails
  }

  test("dsirWeight: target-heavy features weigh above scale, off-target " +
    "below, shingle-less docs zero out, and the coin is deterministic") {
    import spark.implicits._
    // bigrams of doc 1/2 (target) vs 3/4 (raw-only) are disjoint, so
    // target-exclusive buckets get ratio >> 1 and raw-only buckets << 1
    val docs = Seq(
      (1L, "alpha beta alpha beta gamma", true),
      (2L, "alpha beta gamma alpha", true),
      (3L, "delta epsilon zeta delta epsilon", false),
      (4L, "one", false)) // single token: zero bigram shingles
      .toDF("doc_id", "text", "is_t")
    val out = CorpusOps.dsirWeight(docs, "doc_id", "text",
        org.apache.spark.sql.functions.col("is_t"), buckets = 4096)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L)._2 > 1000000L, "target doc must weigh above the scale")
    assert(out(3L)._2 < 1000000L, "raw-only doc must weigh below")
    assert(out(4L) === ((0L, 0L, 0L)))
    // deterministic: a second run reproduces the exact weights and coins
    val again = CorpusOps.dsirWeight(docs, "doc_id", "text",
        org.apache.spark.sql.functions.col("is_t"), buckets = 4096)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(again === out)
  }

  test("ngramDiversity: hand-computed occurrence/distinct counts, floor " +
    "ppm, and the zero-ngram group keeps a zero row") {
    import spark.implicits._
    val docs = Seq(
      // src a: trigrams (a b c), (b c a), (c a b), (a b c) — 4 occ, 3 distinct
      (1L, "a b c a b c", "a"),
      // src b: one trigram
      (2L, "x y z", "b"),
      // src c: both docs shorter than 3 tokens — zero trigrams
      (3L, "p q", "c"),
      (4L, "", "c"))
      .toDF("doc_id", "text", "source")
    val out = CorpusOps.ngramDiversity(docs, "doc_id", "text", "source", 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      "a" -> ((4L, 3L, 750000L)),
      "b" -> ((1L, 1L, 1000000L)),
      "c" -> ((0L, 0L, 0L))))
  }

  test("repeatPlan: equal-share targets, ceiling epochs, the repeat cap " +
    "binding on a tiny source, and the zero-token source") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t t t t t t t t t t", "big"),  // 10 tokens
      (2L, "t t", "small"),                // 2 tokens -> cap binds
      (3L, "", "empty"))                   // 0 tokens
      .toDF("doc_id", "text", "source")
    // budget 30, 3 sources -> target 10 each; cap 4 epochs
    val out = CorpusOps.repeatPlan(docs, "text", "source",
        budgetTokens = 30L, maxEpochs = 4L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(out === Map(
      // big: 10 tokens, planned min(10, 40)=10, epochs ceil(10/10)=1
      "big" -> ((1L, 10L, 10L, 10L, 1L, 0L)),
      // small: planned min(10, 8)=8, epochs ceil(8/2)=4, shortfall 2
      "small" -> ((1L, 2L, 10L, 8L, 4L, 2L)),
      // empty: planned min(10, 0)=0, epochs 0, shortfall 10
      "empty" -> ((1L, 0L, 10L, 0L, 0L, 10L))))
  }

  test("tCloseness: hand-computed total variation in exact ppm — an " +
    "all-global-distribution class scores 0, a single-value class " +
    "scores 1 - p(v), and the threshold verdict cross-multiplies") {
    import spark.implicits._
    // global: 8 en, 4 de (N = 12); class A mirrors it exactly (4/2),
    // class B is all-en (4/0)
    val docs = (Seq.fill(4)("en") ++ Seq.fill(2)("de")).map(("A", _)) ++
      (Seq.fill(4)("en")).map(("B", _)) ++ Seq(("C", "de"), ("C", "de"))
    val df = docs.zipWithIndex.map { case ((s, l), i) => (i.toLong, s, l) }
      .toDF("doc_id", "source", "lang")
    val out = CorpusOps.tCloseness(df, "source", "lang", 1L, 5L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // A: p_c = (4/6, 2/6) == global (8/12, 4/12) -> TV 0, no violation
    assert(out("A") === ((6L, 0L, 0L)))
    // B: all-en -> TV = 1 - p(en) = 1 - 8/12 = 1/3 -> 333333 ppm > 1/5
    assert(out("B") === ((4L, 333333L, 1L)))
    // C: all-de -> TV = 1 - p(de) = 1 - 4/12 = 2/3 -> 666666 ppm > 1/5
    assert(out("C") === ((2L, 666666L, 1L)))
  }

  test("shardPlan: snake deal over the size-desc rank — per-shard token " +
    "mass is within one document of even, every shard non-empty, " +
    "deterministic") {
    import spark.implicits._
    // 16 docs with sizes 16..1 -> ranks 1..16, shards snake 0..3,3..0:
    // every shard gets exactly 17+17 = 34 tokens on the first two rounds
    val docs = (1L to 16L).map(i =>
      (i, Seq.fill(17 - i.toInt)("t").mkString(" ")))
      .toDF("doc_id", "text")
    val out = CorpusOps.shardPlan(docs, "doc_id", "text", nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.length === 16)
    // rank = 17 - size ordering: doc 1 (16 tokens) ranks 1
    assert(out.find(_._1 == 1L).get._3 === 1L)
    val byShard = out.groupBy(_._4).view.mapValues(_.map(_._2).sum).toMap
    assert(byShard.keySet === Set(0L, 1L, 2L, 3L))
    // sizes 16..1 snake-dealt: every shard sums to exactly 34
    assert(byShard.values.toSet === Set(34L))
    val again = CorpusOps.shardPlan(docs, "doc_id", "text", nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(again === out.map(r => (r._1, r._4)).toSet)
  }

  test("dedupScrub: removes exactly the tokens covered by cross-doc " +
    "dup trigrams, keeps within-doc repetition, and reassembles order") {
    import spark.implicits._
    val docs = Seq(
      // docs 1 and 2 share the trigram 'x y z' -> those 3 tokens scrub
      // from both; surrounding tokens survive
      (1L, "a x y z b"),
      (2L, "x y z c"),
      // doc 3 repeats a trigram WITHIN itself only (1 distinct doc) ->
      // nothing scrubs
      (3L, "p q r p q r"),
      (4L, "")) // empty doc -> zero rows, empty text
      .toDF("doc_id", "text")
    val out = CorpusOps.dedupScrub(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out === Map(
      1L -> ((5L, 3L, "a b")),
      2L -> ((4L, 3L, "c")),
      3L -> ((6L, 0L, "p q r p q r")),
      4L -> ((0L, 0L, ""))))
  }

  test("dedupScrub observes the posting hot tail: a boilerplate shingle " +
    "in every doc surfaces in hot_shingles/max_df, and the metric " +
    "changes NO output row") {
    import spark.implicits._
    // 'the same boiler plate' in all 6 docs -> its 2 trigrams have df 6;
    // each doc's own distinct tail token keeps the docs distinct
    val docs = (1L to 6L)
      .map(i => (i, s"the same boiler plate t$i"))
      .toDF("doc_id", "text")
    val out = CorpusOps.dedupScrub(docs, "doc_id", "text", n = 3,
      hotDf = 5L)
    val rows = out.collect()
    // the boilerplate head scrubs everywhere; the doc-unique tail token
    // survives in each (covered only by windows that start in the dup
    // region up to n-1 before it -> 'plate t_i' windows: 'boiler plate
    // t_i' is unique per doc, so t_i is NOT covered... compute: dup
    // trigrams are 'the same boiler' (df 6) and 'same boiler plate'
    // (df 6); covered positions per doc = 0..4 minus those beyond
    // coverage: starts at 0 and 1, window n=3 covers pos 0..2 and 1..3
    // -> tokens 0..3 scrub, token 4 (t_i) survives
    rows.foreach { r =>
      assert(r.getLong(1) === 5L)
      assert(r.getLong(2) === 4L)
      assert(r.getString(3) === s"t${r.getLong(0)}")
    }
    val m = out.queryExecution.observedMetrics("dedup_scrub")
    assert(m.getLong(0) === 2L) // hot_shingles: both boilerplate trigrams
    assert(m.getLong(1) === 6L) // max_df
    assert(m.getLong(2) === 2L) // dup_shingles
  }

  test("charDedupScrub: cuts exactly the cross-doc duplicated islands " +
    "at char grain, keeps within-doc repetition, merges overlapping " +
    "windows into one island, and short/empty docs survive verbatim") {
    import spark.implicits._
    val docs = Seq(
      // docs 1/2 share the 3-gram 'xyz' -> island [1,3] in doc 1,
      // [0,2] in doc 2
      (1L, "axyzb"),
      (2L, "xyzc"),
      // doc 3 repeats 'pqr' WITHIN itself only -> nothing scrubs
      (3L, "pqrpqr"),
      (4L, "ab"), // shorter than k -> no windows -> verbatim
      (5L, ""),   // empty
      // docs 6/7 share a 10-char run: 8 consecutive dup starts merge
      // into ONE island [0,9]; the doc-unique tail char survives
      (6L, "qwertyuiop1"),
      (7L, "qwertyuiop2"))
      .toDF("doc_id", "text")
    val postings = CorpusOps.charPostings(docs, "doc_id", "text", k = 3)
    val out = CorpusOps.charDedupScrub(docs, postings, "doc_id", "text",
        k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out === Map(
      1L -> ((5L, 3L, "ab")),
      2L -> ((4L, 3L, "c")),
      3L -> ((6L, 0L, "pqrpqr")),
      4L -> ((2L, 0L, "ab")),
      5L -> ((0L, 0L, "")),
      6L -> ((11L, 10L, "1")),
      7L -> ((11L, 10L, "2"))))
  }

  test("charDedupScrub parity: scrubbing a duplicate-free corpus is the " +
    "identity transform, and the hot-window metric observes the dup " +
    "tail without changing any row") {
    import spark.implicits._
    // genuinely duplicate-free at 12-char grain: each doc's alphabet is
    // {its digit, 'x'}, so no 12-codepoint substring crosses documents
    val clean = (1L to 8L).map(i => (i, s"${i}x" * 10))
      .toDF("doc_id", "text")
    val cleanPost = CorpusOps.charPostings(clean, "doc_id", "text", 12)
    val id = CorpusOps.charDedupScrub(clean, cleanPost, "doc_id", "text",
        k = 12)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    val texts = clean.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    id.foreach { case (d, removed, out) =>
      assert(removed === 0L)
      assert(out === texts(d), s"doc $d not identity")
    }
    // boilerplate corpus: the shared 12+-char head is hot (df = 6 > 5)
    val boiler = (1L to 6L).map(i => (i, s"the shared boilerplate $i"))
      .toDF("doc_id", "text")
    val bPost = CorpusOps.charPostings(boiler, "doc_id", "text", 12)
    val scrubbed = CorpusOps.charDedupScrub(boiler, bPost, "doc_id",
      "text", k = 12, hotDf = 5L)
    val rows = scrubbed.collect()
    // 'the shared boilerplate ' (23 chars) is common; its 12-gram
    // windows at starts 0..11 are df-6 dups -> island [0, 22] cut,
    // leaving the doc-unique digit
    rows.foreach { r =>
      assert(r.getString(3) === r.getLong(0).toString)
      assert(r.getLong(2) === 23L)
    }
    val m = scrubbed.queryExecution.observedMetrics("char_dedup_scrub")
    assert(m.getLong(0) === 12L) // hot_windows: starts 0..11, df 6 > 5
    assert(m.getLong(1) === 6L)  // max_df
    assert(m.getLong(2) === 12L) // dup_windows
  }

  test("charDupSpans and charContaminationScore: hand-checked at k=3 — " +
    "cross-doc windows flag, within-doc-only do not, short docs absent " +
    "or NULL, islands run math holds at char grain") {
    import spark.implicits._
    // windows(1)=abc,bcd,cde,def; windows(2)=xxc,xcd,cde,dey; (3) none
    val docs = Seq((1L, "abcdef"), (2L, "xxcdey"), (3L, "zz"))
      .toDF("doc_id", "text")
    val spans = CorpusOps.charDupSpans(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    // only 'cde' (pos 2 in doc1, pos 2 in doc2) is cross-document
    assert(spans === Map(
      1L -> ((4L, 1L, 0.25, 1L)),
      2L -> ((4L, 1L, 0.25, 1L))))
    // contamination: eval doc windows cde,def,efg,fgh; train doc1 hits
    // {cde,def} of 4; doc2 hits {cde} of 4; doc3 has no windows -> NULL
    val eval = Seq((9L, "cdefgh")).toDF("doc_id", "text")
    val cont = CorpusOps.charContaminationScore(docs, eval,
        "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(cont === Map(
      1L -> ((4L, 2L, Some(0.5))),
      2L -> ((4L, 1L, Some(0.25))),
      3L -> ((0L, 0L, None))))
    // the shared-artifact spelling (one posting frame, predicates split
    // the slices) is value-identical to the standalone one
    val all = docs.unionByName(eval)
    val postings = CorpusOps.charPostings(all, "doc_id", "text", k = 3)
    val contShared = CorpusOps.charContamination(all, postings, "doc_id",
        trainPred = org.apache.spark.sql.functions.col("doc_id") < 9,
        evalPred = org.apache.spark.sql.functions.col("doc_id") === 9)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(contShared === cont)
    val spansShared = CorpusOps.charDupSpansFromPostings(
        CorpusOps.charPostings(docs, "doc_id", "text", k = 3), "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(spansShared === spans)
  }

  test("codeSwitch: disagreeing halves flag mixed, agreeing and empty " +
    "docs do not, and the odd-length split gives the tail the extra " +
    "token") {
    import spark.implicits._
    val docs = Seq(
      // head 'the a of' -> en; tail 'join query group' -> zh
      (1L, "the a of join query group"),
      (2L, "the a the a"),   // en / en — consistent
      (3L, ""),              // both halves empty -> tie-order 'en'
      // 5 tokens: head = first 2 ('the a' -> en), tail = last 3
      // ('join query group' -> zh) — the extra token goes to the tail
      (4L, "the a join query group"))
      .toDF("doc_id", "text")
    val out = CorpusOps.codeSwitch(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3), r.getBoolean(4))))
      .toMap
    assert(out === Map(
      1L -> ((6L, "en", "zh", true)),
      2L -> ((4L, "en", "en", false)),
      3L -> ((0L, "en", "en", false)),
      4L -> ((5L, "en", "zh", true))))
  }

  test("tokenizerFertility: per-lang inventories, floor-ppm rate, and " +
    "the zero-char guard") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three", "en", 13L),
      (2L, "four five", "en", 9L),
      (3L, "uno", "es", 3L),
      (4L, "", "zz", 0L)) // zero chars AND zero tokens
      .toDF("doc_id", "text", "lang", "n_chars")
    val out = CorpusOps.tokenizerFertility(docs, "text", "lang", "n_chars")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      "en" -> ((2L, 5L, 22L, 5L * 1000000L / 22L)),
      "es" -> ((1L, 1L, 3L, 333333L)),
      "zz" -> ((1L, 0L, 0L, 0L))))
  }
}
