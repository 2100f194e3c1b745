package graft.text

import graft.SparkSpec
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the corpus operators over random
  * small-vocabulary documents. */
object CorpusOpsProps extends Properties("CorpusOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.session

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
  private val genDoc: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
  private val genCorpus: Gen[List[String]] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, genDoc))

  property("chunking with stride = chunkSize partitions the token stream " +
    "exactly: concatenated chunks rebuild every document") =
    forAll(genCorpus, Gen.chooseNum(1, 7)) { (texts, k) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val chunks = CorpusOps.chunkDocuments(docs, "doc_id", "text",
          chunkSize = k, stride = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      val rebuilt = chunks.groupBy(_._1).map { case (id, cs) =>
        id -> cs.sortBy(_._2).map(_._3).mkString(" ") }
      val want = texts.zipWithIndex.collect {
        case (t, i) if t.split(" ").exists(_.nonEmpty) =>
          i.toLong -> t.split(" ").filter(_.nonEmpty).mkString(" ")
      }.toMap
      rebuilt == want
    }

  property("decontaminate partitions the train set: kept docs share no " +
    "n-gram with eval, dropped docs share at least one") =
    forAll(genCorpus, genCorpus, Gen.chooseNum(1, 3)) { (trainT, evalT, n) =>
      import spark.implicits._
      val train = trainT.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val eval = evalT.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("doc_id", "text")
      val keptIds = CorpusOps.decontaminate(train, eval, "doc_id", "text", n)
        .collect().map(_.getLong(0)).toSet
      def grams(s: String): Set[String] = {
        val tk = s.split(" ").filter(_.nonEmpty)
        tk.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
      }
      val evalGrams = evalT.flatMap(grams).toSet
      trainT.zipWithIndex.forall { case (t, i) =>
        val contaminated = grams(t).exists(evalGrams.contains)
        keptIds.contains(i.toLong) == !contaminated
      }
    }

  property("packSequences invariants on any corpus and budget: offsets " +
    "are the exact exclusive prefix sums in id order per block, bins are " +
    "floor(offset/budget) and nondecreasing, and every token is " +
    "accounted for exactly once") =
    forAll(genCorpus, Gen.chooseNum(1L, 12L)) { (texts, budget) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, if (i % 2 == 0) "b0" else "b1", t) }
        .toDF("doc_id", "blk", "text")
      val got = CorpusOps.packSequences(docs, "doc_id", "text", Seq("blk"),
          budget)
        .collect()
        .map(r => (r.getAs[String]("blk"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("start_offset"),
          r.getAs[Long]("bin")))
      got.groupBy(_._1).forall { case (_, rows) =>
        val inOrder = rows.sortBy(_._2)
        val offsets = inOrder.scanLeft(0L)(_ + _._3).init
        inOrder.map(_._4).sameElements(offsets) &&
          inOrder.forall { case (_, _, _, off, bin) => bin == off / budget } &&
          inOrder.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) <= w(1))
      } && got.map(_._3).sum == texts.map(_.split(" ").count(_.nonEmpty)).sum
    }

  property("tfidfTopTerms soundness: every reported (tf, df) is the true " +
    "count, scores follow tf*(N/df), and ranks are dense per doc in " +
    "(score desc, term asc) order") =
    forAll(genCorpus) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val n = texts.size.toDouble
      val toks = texts.map(_.split(" ").filter(_.nonEmpty).toSeq)
      val trueTf = toks.zipWithIndex.flatMap { case (tk, i) =>
        tk.groupBy(identity).map { case (w, g) => (i.toLong, w) -> g.size.toLong }
      }.toMap
      val trueDf = toks.map(_.toSet).flatten.groupBy(identity)
        .map { case (w, g) => w -> g.size.toLong }
      val got = CorpusOps.tfidfTopTerms(docs, "doc_id", "text", topK = 3)
        .collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("term"),
          r.getAs[Long]("tf"), r.getAs[Long]("df"),
          r.getAs[Double]("score"), r.getAs[Long]("rank")))
      // COMPLETENESS: the reported rows must be exactly the true top-k
      // per doc under (score desc, term asc) — not merely an internally
      // consistent subset (scores recomputed with the identical IEEE
      // ops, so equality is exact)
      val expected = trueTf.keys.groupBy(_._1).flatMap { case (id, keys) =>
        keys.toSeq.map { case (_, w) =>
          (id, w, -(trueTf((id, w)).toDouble * (n / trueDf(w).toDouble)), w)
        }.sortBy(t => (t._3, t._4)).take(3).zipWithIndex
          .map { case ((_, w, _, _), r) => (id, w, (r + 1).toLong) }
      }.toSet
      got.map(t => (t._1, t._2, t._6)).toSet == expected &&
      got.forall { case (id, term, tf, df, score, _) =>
        trueTf.get((id, term)).contains(tf) &&
          trueDf.get(term).contains(df) &&
          score == tf.toDouble * (n / df.toDouble)
      }
    }

  // ---- cosKeyNano: the staged-floor integer membership gate behind
  // q158 (the exactCosKey discipline applied to PAIR cosines, where
  // dot² and nrm·nrm overflow int128 so the key must be staged). The
  // generator exercises the FULL documented domain (ADVICE r9): norm
  // ratio hi/lo up to 10¹² (the scaladoc bound), norms up to 10²⁸
  // (t·dot ≤ 10⁹·hi must stay inside DECIMAL(38,0)), dot ∈ [0,
  // √(na·nb)] (Cauchy–Schwarz over positive tf-idf weights).

  private def isqrt(n: BigInt): BigInt =
    if (n <= 1) n
    else {
      var x = BigInt(math.sqrt(n.doubleValue).toLong + 2)
      while (x * x > n) x = (x + n / x) / 2
      x
    }

  private val genDotNorms: Gen[(BigInt, BigInt, BigInt)] = for {
    lo <- Gen.chooseNum(1L, 1000000000000L) // 1e12
    ratio <- Gen.chooseNum(1L, 1000000000000L) // 1e12: the full scaladoc bound
    // scale pushes norms past int64 but keeps hi = lo·ratio·scale ≤ 1e28
    // (the t·dot ≤ 1e9·hi < 1e38 decimal envelope)
    scale <- Gen.chooseNum(1L,
      (BigInt(10).pow(28) / (BigInt(lo) * ratio))
        .min(BigInt(1000000000L)).max(BigInt(1)).toLong)
    swap <- Gen.oneOf(true, false)
    dotPermille <- Gen.chooseNum(0L, 1000L)
  } yield {
    val na0 = BigInt(lo) * scale
    val nb0 = BigInt(lo) * ratio * scale
    val dot = isqrt(na0 * nb0) * dotPermille / 1000
    if (swap) (dot, nb0, na0) else (dot, na0, nb0)
  }

  property("cosKeyNano == floor(floor(1e9*dot/lo)*dot/hi) computed in " +
    "arbitrary precision, and within [0, 2) nano-units of 1e9*cos^2") =
    forAll(Gen.listOfN(30, genDotNorms)) { triples =>
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("dot", DecimalType(38, 0)),
        StructField("na", DecimalType(38, 0)),
        StructField("nb", DecimalType(38, 0))))
      val rows = triples.map { case (d, a, b) =>
        org.apache.spark.sql.Row(
          new java.math.BigDecimal(d.bigInteger),
          new java.math.BigDecimal(a.bigInteger),
          new java.math.BigDecimal(b.bigInteger))
      }
      val got = spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), schema)
        .select(CorpusOps.cosKeyNano(col("dot"), col("na"), col("nb")))
        .collect().map(_.getLong(0))
      got.toSeq == triples.map { case (dot, na, nb) =>
        val lo = na.min(nb); val hi = na.max(nb)
        (dot * BigInt(1000000000L) / lo * dot / hi).toLong
      } &&
      got.toSeq.zip(triples).forall { case (k, (dot, na, nb)) =>
        // exact rational 1e9·cos² − key ∈ [0, 2): cross-multiplied,
        // no floats — 0 ≤ 1e9·dot² − k·na·nb < 2·na·nb
        val diff = BigInt(1000000000L) * dot * dot - BigInt(k) * na * nb
        diff >= 0 && diff < 2 * na * nb
      }
    }

  private def polyHash(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 31L + c.toLong) % 1000000007L)

  property("gopherRules == the naive per-document reference for any " +
    "corpus and any integer thresholds") =
    forAll(genCorpus, Gen.chooseNum(1L, 6L), Gen.chooseNum(6L, 40L),
      Gen.chooseNum(1L, 4L), Gen.chooseNum(4L, 9L)) {
      (texts, minTok, maxTok, minLen, maxLen) =>
        import spark.implicits._
        val stop = Seq("alpha", "beta")
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val got = CorpusOps.gopherRules(docs, "doc_id", "text", stop,
            minTok, maxTok, minLen, maxLen, minStop = 1L,
            maxTopShareNum = 1L, maxTopShareDen = 2L)
          .collect().map(r => r.getLong(0) -> (1 to 9).map(r.getLong)).toMap
        val want = texts.zipWithIndex.map { case (t, i) =>
          val tk = t.split(" ").filter(_.nonEmpty)
          val n = tk.length.toLong
          val sumLen = tk.map(_.length.toLong).sum
          val nStop = tk.count(stop.contains).toLong
          val maxTf = if (tk.isEmpty) 0L
            else tk.groupBy(identity).values.map(_.length).max.toLong
          val rW = n >= minTok && n <= maxTok
          val rL = sumLen >= minLen * n && sumLen <= maxLen * n && n > 0
          val rS = nStop >= 1L
          val rR = maxTf * 2L <= n
          def b(x: Boolean) = if (x) 1L else 0L
          i.toLong -> Vector(n, sumLen, nStop, maxTf,
            b(rW), b(rL), b(rS), b(rR), b(rW && rL && rS && rR))
        }.toMap
        got == want
    }

  property("dsirWeight == the naive BigInt likelihood-ratio reference: " +
    "weights, shingle counts, and the mixed coin all reproduce") =
    forAll(genCorpus, Gen.chooseNum(8, 64)) { (texts, buckets) =>
      import spark.implicits._
      // mark every other doc as target; degenerate all-target/none-target
      // corpora are exercised when texts.size == 1
      val rows = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, i % 2 == 0) }
      val docs = rows.toDF("doc_id", "text", "is_t")
      val got = CorpusOps.dsirWeight(docs, "doc_id", "text",
          org.apache.spark.sql.functions.col("is_t"), buckets)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      def shingles(t: String): Set[String] = {
        val tk = t.split(" ").filter(_.nonEmpty)
        tk.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
      }
      val feats = rows.flatMap { case (id, t, tgt) =>
        shingles(t).toSeq.map(s => (id, tgt, polyHash(s) % buckets)) }
      val rF = feats.groupBy(_._3).map { case (f, xs) => f -> xs.size.toLong }
      val tF = feats.groupBy(_._3)
        .map { case (f, xs) => f -> xs.count(_._2).toLong }
      val (rTot, tTot) = (rF.values.sum, tF.values.sum)
      val w = rF.keys.map { f =>
        f -> (BigInt(tF(f) + 1) * BigInt(rTot + buckets) * 1000000 /
          (BigInt(rF(f) + 1) * BigInt(tTot + buckets)))
      }.toMap
      val want = rows.map { case (id, t, _) =>
        val sh = shingles(t)
        val wp = if (sh.isEmpty) 0L
          else (sh.toSeq.map(s => w(polyHash(s) % buckets)).sum /
            sh.size).toLong
        val coin = polyHash(s"dsir:$id") * 48271L % 1000000007L % 2000000L
        id -> ((sh.size.toLong, wp, if (coin < wp) 1L else 0L))
      }.toMap
      got == want
    }

  property("ngramDiversity invariants: n_distinct <= n_ngrams, ppm in " +
    "[0, 1e6], totals == the naive per-source n-gram counts, zero-gram " +
    "sources keep a zero row") =
    forAll(genCorpus, Gen.chooseNum(1, 4)) { (texts, n) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, s"s${i % 3}") }
      val out = CorpusOps.ngramDiversity(
          docs.toDF("doc_id", "text", "source"), "doc_id", "text",
          "source", n)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      def grams(t: String): Seq[String] = {
        val tk = t.split(" ").filter(_.nonEmpty)
        (0 to tk.length - n).map(i => tk.slice(i, i + n).mkString(" "))
      }
      val bySrc = docs.groupBy(_._3)
      out.keySet == bySrc.keySet && bySrc.forall { case (s, ds) =>
        val all = ds.flatMap(d => grams(d._2))
        val (tot, dst, ppm) = out(s)
        tot == all.size && dst == all.distinct.size &&
          ppm >= 0 && ppm <= 1000000L &&
          ppm == (if (tot == 0) 0L else dst * 1000000L / tot)
      }
    }

  property("repeatPlan invariants: planned <= target, epochs <= cap, " +
    "epochs == exact ceiling, shortfall = target - planned, and the " +
    "targets are the equal budget share") =
    forAll(genCorpus, Gen.chooseNum(0L, 500L), Gen.chooseNum(1L, 5L)) {
      (texts, budget, cap) =>
        import spark.implicits._
        val docs = texts.zipWithIndex.map { case (t, i) =>
          (i.toLong, t, s"s${i % 3}") }
        val out = CorpusOps.repeatPlan(
            docs.toDF("doc_id", "text", "source"), "text", "source",
            budget, cap)
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
              r.getLong(5), r.getLong(6)))).toMap
        val nSources = docs.map(_._3).distinct.size
        out.size == nSources && out.values.forall {
          case (nDocs, nTok, target, planned, epochs, shortfall) =>
            target == budget / nSources &&
              planned == math.min(target, nTok * cap) &&
              epochs == (if (nTok == 0) 0L
                         else (planned + nTok - 1) / nTok) &&
              epochs <= cap && shortfall == target - planned &&
              nDocs > 0
        }
    }

  property("dedupScrub invariants: n_removed <= n_tokens, the cleaned " +
    "text has exactly n_tokens - n_removed tokens all drawn from the " +
    "original, and a corpus of UNIQUE-vocab docs is never scrubbed") =
    forAll(genCorpus, Gen.chooseNum(2, 4)) { (texts, n) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = CorpusOps.dedupScrub(docs, "doc_id", "text", n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3)))
      val ok = out.forall { case (id, nt, nr, clean) =>
        val kept = clean.split(" ").filter(_.nonEmpty)
        val orig = texts(id.toInt).split(" ").filter(_.nonEmpty)
        nr >= 0 && nr <= nt && nt == orig.length &&
          kept.length == nt - nr && kept.forall(orig.contains)
      }
      // disjoint-vocabulary corpus: tag every token with its doc id —
      // no shingle can repeat across docs, so nothing scrubs
      val tagged = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t.split(" ").filter(_.nonEmpty)
          .map(w => s"${w}_$i").mkString(" ")) }
      val none = CorpusOps.dedupScrub(
          tagged.toDF("doc_id", "text"), "doc_id", "text", n)
        .collect().forall(_.getLong(2) == 0L)
      ok && none
    }

  property("tCloseness invariants: ppm in [0, 1e6], a single-class " +
    "corpus scores 0, and the verdict is exactly ppm-consistent at the " +
    "cross-multiplied threshold") =
    forAll(genCorpus, Gen.chooseNum(1L, 4L)) { (texts, tNum) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, s"c${i % 3}", vocab(t.length % vocab.size)) }
      val df = docs.toDF("doc_id", "source", "lang")
      val out = CorpusOps.tCloseness(df, "source", "lang", tNum, 5L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      val inRange = out.forall { case (_, nRows, ppm, v) =>
        // ppm floors the exact ratio, so the exact-arithmetic verdict
        // is only unconstrained within one ppm unit of the cut: strictly
        // above it must flag, a full unit below it must not
        val mustFlag = ppm * 5L > tNum * 1000000L
        val mustPass = (ppm + 1L) * 5L <= tNum * 1000000L
        ppm >= 0 && ppm <= 1000000L && nRows > 0 &&
          (!mustFlag || v == 1L) && (!mustPass || v == 0L)
      }
      val single = CorpusOps.tCloseness(
          df.withColumn("source",
            org.apache.spark.sql.functions.lit("only")),
          "source", "lang", tNum, 5L)
        .collect()
      inRange && single.length == 1 && single.head.getLong(2) == 0L &&
        single.head.getLong(3) == 0L
    }
}
