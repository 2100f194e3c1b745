package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Top-k exactness (vs a naive in-memory computation), ANN recall vs the
  * brute-force baseline, and wrong-dim fail-fast. */
class SimilaritySpec extends SparkSpec {

  private val dim = 8

  private def vecs(n: Int, seed: Long): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(i => i -> Seq.fill(dim)(rnd.nextGaussian().toFloat))
  }

  private def toDF(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def naiveTopK(qs: Seq[(Long, Seq[Float])],
                        cs: Seq[(Long, Seq[Float])], k: Int): Set[(Long, Long)] = {
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.round(x.toDouble * Similarity.Scale))
    (for ((qid, qv) <- qs) yield {
      val q = quant(qv)
      val qn = math.sqrt(q.map(x => x * x).sum.toDouble)
      cs.map { case (cid, cv) =>
        val c = quant(cv)
        val dot = q.zip(c).map { case (a, b) => a * b }.sum
        val cn = math.sqrt(c.map(x => x * x).sum.toDouble)
        (cid, dot / (qn * cn))
      }.sortBy { case (cid, cos) => (-cos, cid) }
        .take(k).map(c => qid -> c._1)
    }).flatten.toSet
  }

  test("bruteForceTopK matches the naive computation exactly") {
    val corpus = vecs(60, seed = 1L)
    val queries = corpus.take(4)
    val got = Similarity.bruteForceTopK(toDF(queries), toDF(corpus),
        "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naiveTopK(queries, corpus, 5))
  }

  test("hardNegatives: never returns the query's own label, excludes " +
    "self, and ranks exactly like the label-filtered brute force") {
    import spark.implicits._
    val corpus = vecs(50, seed = 7L)
    val labeled = corpus.map { case (id, v) => (id, v, (id % 5L).toInt) }
    val df = labeled.toDF("vec_id", "embedding", "label")
    val rows = Similarity.hardNegatives(df, "vec_id", "embedding",
      "label", org.apache.spark.sql.functions.col("vec_id") < 3, k = 4)
      .collect()
    assert(rows.length === 12)
    rows.foreach { r =>
      val (qid, cid) = (r.getLong(0), r.getLong(1))
      assert(qid % 5L !== cid % 5L, s"same-label pair ($qid, $cid)")
      assert(qid !== cid)
    }
    // parity with the naive label-filtered ranking
    val naive = (for (q <- labeled.take(3)) yield {
      val cands = labeled.filter(c => c._3 != q._3)
        .map(c => (c._1, c._2))
      naiveTopK(Seq((q._1, q._2)), cands, 4)
    }).flatten.toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet === naive)
  }

  test("knnLabelEval matches the naive full-ranking metrics, and a " +
    "query with no same-label neighbor surfaces NULL rank and 0 hits") {
    import spark.implicits._
    val corpus = vecs(40, seed = 11L)
    // id 0 gets a unique label (no relevant neighbor anywhere); the rest
    // split into two classes
    def lab(id: Long): Int = if (id == 0L) 99 else (id % 2L).toInt
    val df = corpus.map { case (id, v) => (id, v, lab(id)) }
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity.knnLabelEval(df, "vec_id", "embedding", "label",
        org.apache.spark.sql.functions.col("vec_id") < 3, k = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size === 3)
    assert(rows(0L).isNullAt(1) && rows(0L).getLong(2) === 0L &&
      rows(0L).isNullAt(3))
    // naive reference: full exact ranking per query
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.round(x.toDouble * Similarity.Scale))
    for (qid <- Seq(1L, 2L)) {
      val qv = quant(corpus(qid.toInt)._2)
      val qn = math.sqrt(qv.map(x => x * x).sum.toDouble)
      val ranked = corpus.filter(_._1 != qid).map { case (cid, cv) =>
        val c = quant(cv)
        val dot = qv.zip(c).map { case (a, b) => a * b }.sum
        (cid, dot / (qn * math.sqrt(c.map(x => x * x).sum.toDouble)))
      }.sortBy { case (cid, cos) => (-cos, cid) }
      val firstRel = ranked.indexWhere(p => lab(p._1) == lab(qid)) + 1
      val hits = ranked.take(5).count(p => lab(p._1) == lab(qid))
      assert(rows(qid).getLong(1) === firstRel.toLong)
      assert(rows(qid).getLong(2) === hits.toLong)
      assert(rows(qid).getDouble(3) === 1.0 / firstRel)
    }
  }

  test("knnClassify: majority of the naive top-k labels, ties to the " +
    "smallest label, NULL-label candidates never vote") {
    import spark.implicits._
    val corpus = vecs(40, seed = 13L)
    def lab(id: Long): java.lang.Integer =
      if (id == 5L) null else Integer.valueOf((id % 3L).toInt)
    val df = corpus.map { case (id, v) => (id, v, lab(id)) }
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity.knnClassify(df, "vec_id", "embedding", "label",
        org.apache.spark.sql.functions.col("vec_id") < 4, k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(rows.size === 4)
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.round(x.toDouble * Similarity.Scale))
    for (qid <- 0L until 4L) {
      val q = quant(corpus(qid.toInt)._2)
      val qn = math.sqrt(q.map(x => x * x).sum.toDouble)
      val top = corpus.filter(c => c._1 != qid && lab(c._1) != null)
        .map { case (cid, cv) =>
          val c = quant(cv)
          val dot = q.zip(c).map { case (a, b) => a * b }.sum
          (cid, dot / (qn * math.sqrt(c.map(x => x * x).sum.toDouble)))
        }.sortBy { case (cid, cos) => (-cos, cid) }.take(5)
      val expected = top.groupBy(p => lab(p._1).toLong)
        .map { case (l, g) => (l, g.size.toLong) }.toSeq
        .sortBy { case (l, n) => (-n, l) }.head
      assert(rows(qid) === ((expected._1, expected._2)), s"query $qid")
    }
  }

  test("labelNoiseAudit: suspect flags exactly the knnClassify " +
    "disagreements with the point's own label") {
    import spark.implicits._
    val corpus = vecs(40, seed = 37L)
    val df = corpus.map { case (id, v) => (id, v, (id % 3L).toInt) }
      .toDF("vec_id", "embedding", "label")
    val pred = org.apache.spark.sql.functions.col("vec_id") < 6
    val audit = Similarity.labelNoiseAudit(df, "vec_id", "embedding",
        "label", pred, k = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val knn = Similarity.knnClassify(df, "vec_id", "embedding", "label",
        pred, k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(audit.keySet === knn.keySet)
    audit.foreach { case (qid, (own, p, votes, suspect)) =>
      assert(own === qid % 3L)
      assert((p, votes) === knn(qid))
      assert(suspect === (if (p != own) 1L else 0L))
    }
  }

  test("gated kNN family: nProbe = nCentroids is pass-through (equals " +
    "the exact variants row-for-row); a narrow gate never adds hits") {
    import spark.implicits._
    val corpus = vecs(40, seed = 19L)
    val df = corpus.map { case (id, v) => (id, v, (id % 3L).toInt) }
      .toDF("vec_id", "embedding", "label")
    val pred = org.apache.spark.sql.functions.col("vec_id") < 5
    val cents = corpus.take(4).map(_._2.map(x =>
      math.round(x.toDouble * Similarity.Scale)))
    def evalKey(df: DataFrame): Map[Long, (Option[Long], Long, Option[Double])] =
      df.collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    // pass-through: probing every list scores the whole corpus — the
    // gated spelling must reproduce the exact variant bit-for-bit
    val exactEval = evalKey(Similarity.knnLabelEval(df, "vec_id",
      "embedding", "label", pred, k = 5))
    val fullGate = evalKey(Similarity.knnLabelEvalGated(df, "vec_id",
      "embedding", "label", pred, k = 5, cents, nProbe = cents.size))
    assert(fullGate === exactEval)
    def tripletKey(df: DataFrame): Set[(Long, Option[Long], Option[Long], Option[Long])] =
      df.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    val exactTriplet = tripletKey(Similarity.tripletMargin(df, "vec_id",
      "embedding", "label", pred))
    val fullTriplet = tripletKey(Similarity.tripletMarginGated(df,
      "vec_id", "embedding", "label", pred, cents, nProbe = cents.size))
    assert(fullTriplet === exactTriplet)
    // a full-probe gate reproduces the exact ranking, so the rank
    // agreement is PERFECT: 5 matches, ao_num = 137+77+47+27+12 = the
    // whole 300 denominator, ppm exactly 1e6 for every query
    val agree = Similarity.gateRankAgreement(df.where(pred), df,
        "vec_id", "embedding", k = 5, cents, nProbe = cents.size)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(agree.length === 5)
    agree.foreach { case (_, nm, num, den, ppm) =>
      assert((nm, num, den, ppm) === ((5L, 300L, 300L, 1000000L)))
    }
    // the knob CURVE over the same gate: recall_ppm and ao_ppm are
    // non-decreasing in nProbe (candidate sets only grow, and a matched
    // pair's gated rank never exceeds its exact rank), and the full
    // probe reads exactly 10^6 ppm on both with every top-k matched
    val curve = Similarity.gateKnobCurve(df.where(pred), df, "vec_id",
        "embedding", k = 5, cents, nProbes = Seq(1, 2, 4))
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(curve.map(_._1).toSeq === Seq(1L, 2L, 4L))
    curve.foreach { case (_, nq2, nm, rec, num, den, ppm) =>
      assert(nq2 === 5L)
      assert(den === 1500L) // 300 * 5 queries
      assert(nm >= 0L && nm <= 25L && num <= den)
      assert(rec === nm * 1000000L / 25L)
      assert(ppm === num * 1000000L / 1500L)
    }
    curve.sliding(2).foreach {
      case Array((_, _, nm1, rec1, num1, _, ppm1),
                 (_, _, nm2, rec2, num2, _, ppm2)) =>
        assert(nm1 <= nm2 && rec1 <= rec2 && num1 <= num2 && ppm1 <= ppm2,
          s"curve not monotone: $curve")
      case _ =>
    }
    val (_, _, fnm, frec, _, _, fppm) = curve.last
    assert((fnm, frec, fppm) === ((25L, 1000000L, 1000000L)),
      s"full probe (nProbe=4=nCentroids) must read 10^6 ppm: $curve")
    // the AO arithmetic is int64-bounded by construction: k past 25
    // must refuse loudly, never overflow silently (ADVICE r12)
    val tooDeep = intercept[IllegalArgumentException] {
      Similarity.gateRankAgreement(df.where(pred), df, "vec_id",
        "embedding", k = 26, cents, nProbe = 2)
    }
    assert(tooDeep.getMessage.contains("25"))
    val exactHn = Similarity.hardNegatives(df, "vec_id", "embedding",
        "label", pred, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val fullHn = Similarity.hardNegativesGated(df, "vec_id", "embedding",
        "label", pred, k = 4, cents, nProbe = cents.size)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(fullHn === exactHn)
    val exactNoise = Similarity.labelNoiseAudit(df, "vec_id", "embedding",
        "label", pred, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val fullNoise = Similarity.labelNoiseAuditGated(df, "vec_id",
        "embedding", "label", pred, k = 5, cents, nProbe = cents.size)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(fullNoise === exactNoise)
    // a narrow gate (nProbe = 1): recompute the WHOLE gated path naively
    // — exact integer cos-key assignment (sign·⌊dot²·10⁹/cnrm⌋, smallest
    // cid ties), single-list candidates, metrics over the gated ranking.
    // NOTE hits@k is deliberately NOT compared against the exact
    // variant's: shrinking the candidate set can PROMOTE same-label
    // neighbors into the top-k, so the gated hits can exceed the exact
    // ones — only the independent recomputation is a valid pin.
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.round(x.toDouble * Similarity.Scale))
    def key(v: Seq[Long], c: Seq[Long]): Option[BigInt] = {
      val cnrm = c.map(x => BigInt(x) * x).sum
      if (cnrm == 0) None
      else {
        val dot = v.zip(c).map { case (a, b) => BigInt(a) * b }.sum
        val mag = dot * dot * BigInt(1000000000) / cnrm
        Some(if (dot < 0) -mag else mag)
      }
    }
    def assignCid(v: Seq[Long]): Int = {
      val keys = cents.map(c => key(v, c))
      val valid = keys.zipWithIndex.collect { case (Some(k0), j) => (k0, j) }
      if (valid.isEmpty) 1
      else valid.maxBy { case (k0, j) => (k0, -j) }._2 + 1
    }
    val qv = corpus.map { case (id, v) => id -> quant(v) }.toMap
    val cid = corpus.map { case (id, _) => id -> assignCid(qv(id)) }.toMap
    val narrow = evalKey(Similarity.knnLabelEvalGated(df, "vec_id",
      "embedding", "label", pred, k = 5, cents, nProbe = 1))
    assert(narrow.keySet === (0L until 5L).toSet)
    for (q <- 0L until 5L) {
      val lab = (q % 3L).toInt
      val qq = qv(q)
      val qn = math.sqrt(qq.map(x => x * x).sum.toDouble)
      val ranked = corpus
        .filter { case (c, _) => c != q && cid(c) == cid(q) }
        .map { case (c, _) =>
          val cv = qv(c)
          val dot = qq.zip(cv).map { case (a, b) => a * b }.sum
          (c, dot / (qn * math.sqrt(cv.map(x => x * x).sum.toDouble)))
        }.sortBy { case (c, cos) => (-cos, c) }
      val rel = ranked.indexWhere { case (c, _) => c % 3L == lab }
      val expFirst = if (rel < 0) None else Some(rel + 1L)
      val expHits = ranked.take(5).count { case (c, _) => c % 3L == lab }.toLong
      assert(narrow(q) === ((expFirst, expHits,
        expFirst.map(r => 1.0 / r))), s"query $q")
    }
  }

  test("clusterPurity: hand-checked contingency over the shared " +
    "assignment — sizes, majority with smallest-label ties, floor ppm") {
    import spark.implicits._
    val corpus = vecs(30, seed = 17L)
    val df = corpus.map { case (id, v) => (id, v, (id % 2L).toInt) }
      .toDF("vec_id", "embedding", "label")
    val cents = corpus.take(4).map(_._2.map(x =>
      math.round(x.toDouble * Similarity.Scale)))
    val out = Similarity.clusterPurity(df, "vec_id", "embedding", "label",
        cents)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // independent contingency from the op's own assignment surface (the
    // assignment itself is pinned by SimilarityProps/q149a)
    val assign = Similarity.ivfAssignments(df, "vec_id", "embedding",
        cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = assign.groupBy(_._2)
    assert(out.keySet === byCluster.keySet)
    for ((cid, members) <- byCluster) {
      val labels = members.map { case (id, _) => id % 2L }
      val (majLab, majN) = labels.groupBy(identity)
        .map { case (l, g) => (l, g.size.toLong) }.toSeq
        .sortBy { case (l, n) => (-n, l) }.head
      assert(out(cid) === ((labels.size.toLong, majLab, majN,
        majN * 1000000L / labels.size)), s"cluster $cid")
    }
    // purity is 1.0 exactly when the cluster is single-label
    out.values.foreach { case (n, _, nm, ppm) =>
      assert((ppm == 1000000L) === (n == nm))
    }
  }

  test("tripletMargin: picks the naive best positive and hardest " +
    "negative, compares them like the float cosine would, and a " +
    "unique-label query surfaces NULL positive and NULL margin") {
    import spark.implicits._
    val corpus = vecs(40, seed = 29L)
    // id 0: unique label (no positive anywhere); others split in two
    def lab(id: Long): Int = if (id == 0L) 99 else (id % 2L).toInt
    val df = corpus.map { case (id, v) => (id, v, lab(id)) }
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity.tripletMargin(df, "vec_id", "embedding",
        "label", org.apache.spark.sql.functions.col("vec_id") < 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size === 3)
    assert(rows(0L).isNullAt(1) && !rows(0L).isNullAt(2) &&
      rows(0L).isNullAt(3))
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.round(x.toDouble * Similarity.Scale))
    for (qid <- Seq(1L, 2L)) {
      val q = quant(corpus(qid.toInt)._2)
      val qn = math.sqrt(q.map(x => x * x).sum.toDouble)
      def ranked(pred: Long => Boolean): Seq[(Long, Double)] =
        corpus.filter(c => c._1 != qid && pred(c._1)).map { case (cid, cv) =>
          val c = quant(cv)
          val dot = q.zip(c).map { case (a, b) => a * b }.sum
          (cid, dot / (qn * math.sqrt(c.map(x => x * x).sum.toDouble)))
        }.sortBy { case (cid, cos) => (-cos, cid) }
      val bestPos = ranked(id => lab(id) == lab(qid)).head
      val bestNeg = ranked(id => lab(id) != lab(qid)).head
      assert(rows(qid).getLong(1) === bestPos._1, s"pos of $qid")
      assert(rows(qid).getLong(2) === bestNeg._1, s"neg of $qid")
      assert(rows(qid).getLong(3) ===
        (if (bestPos._2 > bestNeg._2) 1L else 0L), s"margin of $qid")
    }
  }

  test("truncationRecall: overlap of the naive full-dim and prefix-dim " +
    "top-k rankings, k clamped by corpus size, zero-overlap possible") {
    import spark.implicits._
    val corpus = vecs(30, seed = 31L)
    val df = toDF(corpus)
    val rows = Similarity.truncationRecall(df, "vec_id", "embedding",
        org.apache.spark.sql.functions.col("vec_id") < 3, k = 4,
        prefixDim = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(rows.size === 3)
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.round(x.toDouble * Similarity.Scale))
    for (qid <- 0L until 3L) {
      def topIds(dims: Int): Set[Long] = {
        val q = quant(corpus(qid.toInt)._2).take(dims)
        val qn = math.sqrt(q.map(x => x * x).sum.toDouble)
        corpus.filter(_._1 != qid).map { case (cid, cv) =>
          val c = quant(cv).take(dims)
          val dot = q.zip(c).map { case (a, b) => a * b }.sum
          (cid, dot / (qn * math.sqrt(c.map(x => x * x).sum.toDouble)))
        }.sortBy { case (cid, cos) => (-cos, cid) }.take(4).map(_._1).toSet
      }
      val expect = (topIds(dim) intersect topIds(2)).size.toLong
      assert(rows(qid) === ((expect, 4L)), s"query $qid")
    }
  }

  test("clusterBalancedSample: ranks by the content-hash coin within " +
    "each assigned cluster, honors the quota, and is deterministic") {
    import spark.implicits._
    val corpus = vecs(60, seed = 23L)
    val df = toDF(corpus)
    val cents = corpus.take(4).map(_._2.map(x =>
      math.round(x.toDouble * Similarity.Scale)))
    val out = Similarity.clusterBalancedSample(df, "vec_id", "embedding",
        cents, quota = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val assign = Similarity.ivfAssignments(df, "vec_id", "embedding",
        cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def coin(id: Long): Long = {
      var h = 0L
      s"cbs:$id".codePoints().toArray.foreach { c =>
        h = (h * 31L + c) % 1000000007L
      }
      h
    }
    // per cluster: the op's survivors are exactly the quota smallest
    // (coin, id) members, ranked 1..min(quota, size)
    val byCluster = assign.toSeq.groupBy(_._2)
    assert(out.groupBy(_._1).keySet.subsetOf(byCluster.keySet))
    for ((cid, members) <- byCluster) {
      val expect = members.map(_._1).sortBy(id => (coin(id), id)).take(3)
        .zipWithIndex.map { case (id, i) =>
          (cid, id, coin(id), i + 1L) }
      assert(out.filter(_._1 == cid).sortBy(_._4).toSeq === expect,
        s"cluster $cid")
    }
    // quota respected everywhere
    assert(out.groupBy(_._1).values.forall(_.length <= 3))
  }

  test("bruteForceTopK returns exactly k ranked rows per query, rank 1 = self") {
    val corpus = vecs(40, seed = 2L)
    val queries = corpus.take(3)
    val rows = Similarity.bruteForceTopK(toDF(queries), toDF(corpus),
        "vec_id", "embedding", k = 4).collect()
    assert(rows.length === 12)
    // a query vector's own corpus copy has cosine 1 → rank 1
    rows.filter(_.getLong(3) == 1L)
      .foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("annTopK: every result also appears in the brute-force ranking and " +
    "recall@3 is positive") {
    val corpus = vecs(200, seed = 3L)
    val queries = corpus.take(8)
    val exact = naiveTopK(queries, corpus, 3)
    val ann = Similarity.annTopK(toDF(queries), toDF(corpus),
        "vec_id", "embedding", k = 3, numPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // self-match always shares the bucket → recall > 0 guaranteed
    val recall = ann.intersect(exact).size.toDouble / exact.size
    assert(recall > 0.3, s"recall=$recall")
    // ANN candidates are a subset of the corpus scored exactly — any pair
    // it returns for rank<=k must be in the exact top-|bucket| order; at
    // minimum the self pair is always found:
    queries.foreach { case (qid, _) => assert(ann.contains(qid -> qid)) }
  }

  test("ivfTopK: self-match always found, results within brute-force ordering") {
    val corpus = vecs(150, seed = 5L)
    val queries = corpus.take(6)
    val got = Similarity.ivfTopK(toDF(queries), toDF(corpus),
        "vec_id", "embedding", k = 3, nCentroids = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a query probes its own nearest centroid first, so it always finds itself
    queries.foreach { case (qid, _) => assert(got.contains(qid -> qid)) }
    val exact = naiveTopK(queries, corpus, 3)
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall > 0.3, s"recall=$recall")
  }

  test("ivfTopK: a zero-norm SEED CENTROID is probed LAST (NULLS-LAST " +
    "probe order, matching the oracle) — with one dead centroid of two, " +
    "nProbe = 1 still probes the live list and equals brute force") {
    val base = vecs(40, seed = 9L)
    // the second seed vector (id order) is all-zero → centroid 2 has
    // NULL cosine to everything; every corpus vector assigns to list 1
    val corpus = base.map { case (id, v) =>
      if (id == 1L) (id, Seq.fill(dim)(0.0f)) else (id, v) }
    val queries = corpus.filter(_._1 != 1L).take(3)
    val ivf = Similarity.ivfTopK(toDF(queries), toDF(corpus),
        "vec_id", "embedding", k = 4, nCentroids = 2, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // dead centroid last ⇒ the single probe hits the live list holding
    // the whole corpus ⇒ exhaustive; NULL-first probe order would probe
    // the EMPTY dead list and return nothing
    val bf = Similarity.bruteForceTopK(toDF(queries), toDF(corpus),
        "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(ivf === bf)
    assert(ivf.nonEmpty)
  }

  test("ivfTopK with nProbe = nCentroids is exhaustive = brute force") {
    val corpus = vecs(50, seed = 6L)
    val queries = corpus.take(3)
    val ivf = Similarity.ivfTopK(toDF(queries), toDF(corpus),
        "vec_id", "embedding", k = 4, nCentroids = 4, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val bf = Similarity.bruteForceTopK(toDF(queries), toDF(corpus),
        "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(ivf === bf)
  }

  test("annTopKBanded: self-match always found, recall positive, at most " +
    "k ranked rows per query") {
    val corpus = vecs(200, seed = 8L)
    val queries = corpus.take(6)
    val rows = Similarity.annTopKBanded(toDF(queries), toDF(corpus),
        "vec_id", "embedding", k = 3, bands = 4, planesPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val got = rows.map(r => (r._1, r._2)).toSet
    // a query matches itself in every band → always a candidate
    queries.foreach { case (qid, _) => assert(got.contains(qid -> qid)) }
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.length <= 3 && g.map(_._3).toSet.subsetOf(Set(1L, 2L, 3L)))
    }
    val exact = naiveTopK(queries, corpus, 3)
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall > 0.3, s"recall=$recall")
  }

  test("cosineNearDupPairs equals the naive bucket-gate + exact-cosine " +
    "computation, and the bucket cap drops all pair-producing buckets") {
    val corpus = vecs(120, seed = 7L)
    val got = Similarity.cosineNearDupPairs(toDF(corpus), "vec_id",
        "embedding", minCosine = 0.1, numPlanes = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val planes = Similarity.quantizePlanes(Similarity.hyperplanes(4, dim))
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.round(x.toDouble * Similarity.Scale))
    def bucket(v: Seq[Long]): Long = planes.zipWithIndex.map { case (p, i) =>
      if (p.zip(v).map { case (a, b) => a * b }.sum > 0) 1L << i else 0L
    }.sum
    val qd = corpus.map { case (id, v) => (id, quant(v)) }
    val want = (for {
      (ia, va) <- qd; (ib, vb) <- qd
      if ia < ib && bucket(va) == bucket(vb)
      dot = va.zip(vb).map { case (a, b) => a * b }.sum
      cos = dot.toDouble / (math.sqrt(va.map(x => x * x).sum.toDouble) *
        math.sqrt(vb.map(x => x * x).sum.toDouble))
      if cos >= 0.1
    } yield (ia, ib) -> cos).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12) }
    // a pair needs >= 2 vectors in its bucket, so maxBucketSize = 1 must
    // drop every candidate
    assert(Similarity.cosineNearDupPairs(toDF(corpus), "vec_id", "embedding",
      minCosine = -1.0, numPlanes = 4, maxBucketSize = 1).count() === 0L)
  }

  test("annTopK fails fast on mismatched embedding dimensions") {
    import spark.implicits._
    val good = vecs(10, seed = 4L)
    val bad = toDF(good) // corpus: first row dim 8 → planes dim 8
    val shortQ = Seq((99L, Seq(1f, 2f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.annTopK(shortQ, bad, "vec_id", "embedding", k = 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("dim mismatch")), msgs(ex).mkString("; "))
  }

  test("IVF sampled training: quantizer quality moves recall, never " +
    "correctness — with nProbe = nCentroids the sampled-training result " +
    "equals the full-training result equals brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(5L)
    val emb = (0L until 200L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
    val q = emb.where(org.apache.spark.sql.functions.col("vec_id") < 5)
    def res(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rank"))).toSet
    val brute = res(Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 3))
    val full = res(Similarity.ivfTopK(q, emb, "vec_id", "embedding", k = 3,
      nCentroids = 4, nProbe = 4, kmeansIters = 2))
    val sampled = res(Similarity.ivfTopK(q, emb, "vec_id", "embedding", k = 3,
      nCentroids = 4, nProbe = 4, kmeansIters = 2, trainFraction = 0.3))
    assert(full === brute)
    assert(sampled === brute)
    // and with FEWER probes the sampled variant still returns k rows per
    // query (an approximate result, never a truncated one)
    val few = Similarity.ivfTopK(q, emb, "vec_id", "embedding", k = 3,
      nCentroids = 4, nProbe = 2, kmeansIters = 2, trainFraction = 0.3)
      .groupBy("query_id").count().collect().map(_.getLong(1))
    assert(few.forall(_ === 3L))
  }

  test("pooledUnitEmbeddings: exact quantized sums per dim, unit vector " +
    "has L2 norm 1, zero group yields NULL units") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),   // group 0
      (1L, Seq(0.0f, 1.0f)),   // group 0 → pooled (1e5, 1e5)
      (10L, Seq(0.0f, 0.0f)),  // group 1: all-zero → NULL unit
      (20L, Seq(-0.5f, 0.5f))) // group 2
      .toDF("vec_id", "embedding")
      .withColumn("group_id", org.apache.spark.sql.functions.expr("vec_id DIV 10"))
    val got = Similarity.pooledUnitEmbeddings(emb, "group_id", "embedding")
      .collect()
      .map(r => (r.getAs[Long]("group_id"), r.getAs[Long]("dim")) ->
        ((r.getAs[Long]("s_q"), Option(r.getAs[java.lang.Double]("unit")))))
      .toMap
    assert(got((0L, 0L))._1 === 100000L)
    assert(got((0L, 1L))._1 === 100000L)
    val u0 = math.sqrt(List(0L, 1L).map(d => math.pow(got((0L, d))._2.get, 2)).sum)
    assert(math.abs(u0 - 1.0) < 1e-12)
    assert(got((1L, 0L))._2.isEmpty && got((1L, 1L))._2.isEmpty)
    assert(got((2L, 0L)) === ((-50000L, Some(-1.0 / math.sqrt(2.0)))))
  }

  test("jlTopK: self-match rank 1, full per-query result sets, and " +
    "recall@5 vs the exact ranking above the random-baseline floor") {
    val corpus = vecs(80, seed = 7L)
    val queries = corpus.take(6)
    val exact = naiveTopK(queries, corpus, 5)
    val jl = Similarity.jlTopK(toDF(queries), toDF(corpus),
      "vec_id", "embedding", k = 5, projDim = 4).collect()
    assert(jl.length === 30)
    // a query's own corpus copy projects to the identical vector → cosine
    // 1 in the projected space too → rank 1 survives the projection
    jl.filter(_.getLong(3) == 1L)
      .foreach(r => assert(r.getLong(0) === r.getLong(1)))
    val got = jl.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    // random 5-of-80 would overlap ~6%; JL at dim 8→4 must do far better
    assert(recall >= 0.4, s"JL recall@5 = $recall")
  }

  test("sq8TopK: self-match rank 1, full per-query result sets, and " +
    "recall@5 vs the exact ranking near-perfect") {
    val corpus = vecs(80, seed = 9L)
    val queries = corpus.take(6)
    val exact = naiveTopK(queries, corpus, 5)
    val sq = Similarity.sq8TopK(toDF(queries), toDF(corpus),
      "vec_id", "embedding", k = 5).collect()
    assert(sq.length === 30)
    // a query's own corpus copy reconstructs to a positively-scaled copy
    // of itself up to ~1/127 relative rounding — still cosine ≈ 1, and no
    // other vector beats it → rank 1 survives the quantization
    sq.filter(_.getLong(3) == 1L)
      .foreach(r => assert(r.getLong(0) === r.getLong(1)))
    val got = sq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    // int8 keeps ~7 bits of per-component precision — recall should be
    // near-exact, far above the LSH/JL sketch floors
    assert(recall >= 0.8, s"SQ8 recall@5 = $recall")
  }

  test("sq8TopK matches the naive asymmetric reconstruction exactly, " +
    "sign-safe for negative components") {
    val corpus = vecs(50, seed = 10L)
    val queries = corpus.take(3)
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.round(x.toDouble * Similarity.Scale))
    def encode(q: Seq[Long]): (Seq[Long], Long) = {
      val maxabs = q.map(math.abs).max
      val sv = math.max(1L, (maxabs + 126L) / 127L)
      (q.map(x => if (x < 0) -((-x) / sv) else x / sv), sv)
    }
    val naive = (for ((qid, qv) <- queries) yield {
      val q = quant(qv)
      val qn = math.sqrt(q.map(x => x * x).sum.toDouble)
      corpus.map { case (cid, cv) =>
        val (cc, sv) = encode(quant(cv))
        val dot = sv * q.zip(cc).map { case (a, b) => a * b }.sum
        val cn = math.sqrt((sv * sv * cc.map(x => x * x).sum).toDouble)
        (cid, dot / (qn * cn))
      }.sortBy { case (cid, cos) => (-cos, cid) }
        .take(5).map(c => qid -> c._1)
    }).flatten.toSet
    val got = Similarity.sq8TopK(toDF(queries), toDF(corpus),
        "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive)
  }

  test("ivfClusterStats: matches the naive integer inertia at iters = 0 " +
    "(seed centroids are the first n corpus vectors) and conserves the " +
    "corpus count") {
    val corpus = vecs(60, seed = 11L)
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.round(x.toDouble * Similarity.Scale))
    val cents = corpus.sortBy(_._1).take(4).map(c => quant(c._2))
    val naive = corpus
      .map { case (_, v) =>
        val q = quant(v)
        val qn = math.sqrt(q.map(x => x * x).sum.toDouble)
        // assignment = cosine desc, cid asc — mirror nearestCid
        val cid = cents.zipWithIndex.map { case (c, j) =>
          val dot = q.zip(c).map { case (a, b) => a * b }.sum
          val cn = math.sqrt(c.map(x => x * x).sum.toDouble)
          (-(dot / (qn * cn)), j + 1L)
        }.min._2
        val c = cents((cid - 1).toInt)
        val dist2 = q.map(x => x * x).sum + c.map(x => x * x).sum -
          2L * q.zip(c).map { case (a, b) => a * b }.sum
        cid -> dist2
      }
      .groupBy(_._1)
      .map { case (cid, g) =>
        cid -> ((g.size.toLong, BigDecimal(g.map(_._2).sum))) }
    val got = Similarity.ivfClusterStats(toDF(corpus), "vec_id", "embedding",
        nCentroids = 4, kmeansIters = 0)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), BigDecimal(r.getDecimal(2)))))
      .toMap
    assert(got === naive)
    assert(got.values.map(_._1).sum === 60L)
  }

  test("jlTopK matches the naive projected-space computation exactly") {
    val corpus = vecs(50, seed = 8L)
    val queries = corpus.take(3)
    val planes = Similarity.rademacherPlanes(projDim = 4, dim = dim)
    def proj(v: Seq[Float]): Seq[Long] = {
      val q = v.map(x => math.round(x.toDouble * Similarity.Scale))
      planes.map(p => p.zip(q).map { case (s, x) => s * x }.sum)
    }
    val projected = corpus.map { case (id, v) => (id, proj(v)) }
    val naive = (for ((qid, qy) <- projected.take(3)) yield {
      val qn = math.sqrt(qy.map(x => x.toDouble * x).sum)
      projected.map { case (cid, cy) =>
        val dot = qy.zip(cy).map { case (a, b) => a * b }.sum
        (cid, dot / (qn * math.sqrt(cy.map(x => x.toDouble * x).sum)))
      }.sortBy { case (cid, cos) => (-cos, cid) }
        .take(5).map(c => qid -> c._1)
    }).flatten.toSet
    val got = Similarity.jlTopK(toDF(queries), toDF(corpus),
        "vec_id", "embedding", k = 5, projDim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive)
  }

  test("semDedup matches a naive exact-integer reimplementation: nearest-" +
    "centroid clusters, keep-lowest-centroid-similarity priority, and the " +
    "cross-multiplied epsilon prune (eps = 1/2)") {
    val corpus = vecs(60, seed = 11L)
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.round(x.toDouble * Similarity.Scale))
    val cents = corpus.take(4).map { case (_, v) => quant(v) }
    val cNorms = cents.map(c => c.map(x => x * x).sum)
    // the exactCosKey integer: sign(dot)*floor(dot^2*1e9/cnrm), null-free
    // here (no zero-norm centroid in this fixture)
    def key(v: Seq[Long], j: Int): BigInt = {
      val dot = v.zip(cents(j)).map { case (a, b) => a * b }.sum
      val mag = (BigInt(dot) * dot * 1000000000L) / cNorms(j)
      if (dot < 0) -mag else mag
    }
    val q = corpus.map { case (id, v) => (id, quant(v)) }
    val assigned = q.map { case (id, v) =>
      val keys = cents.indices.map(j => key(v, j))
      val cid = keys.indices.maxBy(j => (keys(j), -j)) + 1
      (id, v, cid.toLong, keys(cid - 1))
    }
    def close(a: Seq[Long], b: Seq[Long]): Boolean = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = a.map(x => x * x).sum
      val nb = b.map(x => x * x).sum
      dot > 0 && BigInt(dot) * dot * 4 >= BigInt(na) * nb
    }
    val naive = assigned.map { case (id, v, cid, k) =>
      val prunedBy = assigned.exists { case (id2, v2, cid2, k2) =>
        cid2 == cid && (k2 < k || (k2 == k && id2 < id)) && close(v, v2)
      }
      (id, cid, if (prunedBy) 0L else 1L)
    }.toSet
    val got = Similarity.semDedup(toDF(corpus), "vec_id", "embedding",
        cents.map(_.toSeq), epsNum = 1L, epsDen = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === naive)
    // the fixture must actually exercise the prune
    assert(naive.exists(_._3 == 0L), "no pair crossed eps; weak fixture")
  }

  test("prototypePruning matches a naive exact-integer reimplementation: " +
    "hardest-first rank within the assigned cluster, keep fraction as a " +
    "cross-multiplied integer (keep 1/3)") {
    val corpus = vecs(60, seed = 13L)
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.round(x.toDouble * Similarity.Scale))
    val cents = corpus.take(4).map { case (_, v) => quant(v) }
    val cNorms = cents.map(c => c.map(x => x * x).sum)
    def key(v: Seq[Long], j: Int): BigInt = {
      val dot = v.zip(cents(j)).map { case (a, b) => a * b }.sum
      val mag = (BigInt(dot) * dot * 1000000000L) / cNorms(j)
      if (dot < 0) -mag else mag
    }
    val assigned = corpus.map { case (id, v) =>
      val q = quant(v)
      val keys = cents.indices.map(j => key(q, j))
      val cid = keys.indices.maxBy(j => (keys(j), -j)) + 1
      (id, cid.toLong, keys(cid - 1))
    }
    val naive = assigned.groupBy(_._2).flatMap { case (cid, members) =>
      val ordered = members.sortBy { case (id, _, k) => (k, id) }
      val n = ordered.size.toLong
      ordered.zipWithIndex.map { case ((id, _, _), i) =>
        val rnk = i + 1L
        (id, cid, rnk, n, if (rnk * 3 <= n * 1) 1L else 0L)
      }
    }.toSet
    val got = Similarity.prototypePruning(toDF(corpus), "vec_id",
        "embedding", cents.map(_.toSeq), keepNum = 1L, keepDen = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === naive)
    // the fixture keeps SOME and prunes SOME in every cluster
    assert(naive.exists(_._5 == 1L) && naive.exists(_._5 == 0L))
  }

  test("semDedup on exact duplicates keeps exactly the smaller id (equal " +
    "centroid keys tie-break by id)") {
    val base = vecs(6, seed = 12L)
    val corpus = base ++ Seq((100L, base.head._2)) // 100 duplicates id 0
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.round(x.toDouble * Similarity.Scale))
    val cents = Seq(quant(base.head._2))
    val out = Similarity.semDedup(toDF(corpus), "vec_id", "embedding",
        cents, epsNum = 99L, epsDen = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(0L) === 1L, "the smaller duplicate id must be kept")
    assert(out(100L) === 0L, "the larger duplicate id must be pruned")
  }
}
