package graft.similarity

import graft.SparkSpec
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the ANN paths on generated CLUSTERED
  * embeddings (uniform random vectors have no cluster structure for IVF
  * to exploit; clustered ones are the workload the operator exists for).
  * Pins the scaladoc's recall/probe tradeoff claim: probing more inverted
  * lists can only widen the candidate set, so recall vs the exact
  * brute-force baseline is monotone in nProbe, and probing EVERY list is
  * exhaustive search — recall exactly 1. */
object SimilarityProps extends Properties("Similarity") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  private val dim = 8
  private val nCentroids = 8

  /** ~60 vectors in a handful of tight clusters: cluster centers from a
    * coarse integer lattice, members = center + small per-coordinate
    * jitter. */
  private val genClustered: Gen[List[(Long, Seq[Float])]] = for {
    nClusters <- Gen.chooseNum(3, 6)
    centers <- Gen.listOfN(nClusters,
      Gen.listOfN(dim, Gen.chooseNum(-5, 5).map(_.toFloat * 2f)))
    sizes <- Gen.listOfN(nClusters, Gen.chooseNum(6, 12))
    members <- Gen.sequence[List[List[List[Float]]], List[List[Float]]](
      centers.zip(sizes).map { case (c, n) =>
        Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-40, 40))
          .map(js => c.zip(js).map { case (x, j) => x + j / 100f }))
      })
  } yield members.flatten.zipWithIndex
    .map { case (v, i) => (i.toLong, v.toSeq) }

  property("ivfTopK recall vs bruteForceTopK is monotone in nProbe " +
    "(2 -> 4 -> 8) and EXACTLY 1 when every list is probed") =
    forAll(genClustered) { rows =>
      import spark.implicits._
      val corpus = rows.toDF("vec_id", "embedding")
      val queries = rows.take(5).toDF("vec_id", "embedding")
      def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("query_id", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = resultSet(Similarity.bruteForceTopK(
        queries, corpus, "vec_id", "embedding", k = 3))
      def recall(nProbe: Int): Double = {
        val got = resultSet(Similarity.ivfTopK(queries, corpus,
          "vec_id", "embedding", k = 3,
          nCentroids = nCentroids, nProbe = nProbe))
        got.count(exact.contains).toDouble / exact.size
      }
      val r2 = recall(2)
      val r4 = recall(4)
      val r8 = recall(nCentroids)
      r2 <= r4 && r4 <= r8 && r8 == 1.0
    }

  // ---- exactCosKey: the float-free centroid-ranking key that closed the
  // q149 hash drift. Its scaladoc's whole claim is "both engines compute
  // the identical integer"; these two properties pin the Spark side to an
  // arbitrary-precision oracle across the key's full documented magnitude
  // range. The generator must respect the key's DOMAIN invariant — dot is
  // an inner product <v,c> with |v|^2 <= Vmax and |c|^2 = cnrm, so
  // Cauchy–Schwarz bounds dot^2 <= Vmax * cnrm (that is exactly what
  // keeps both DIV results long-safe); independent (dot, cnrm) would
  // fabricate inputs no pair of vectors can produce.

  private val Vmax = 640000000000L // |v|^2 at dim 64, components <= 1e5

  /** (dot, cnrm) with cnrm = 0 -> NULL sometimes, else dot^2 <= Vmax*cnrm. */
  private val genDotCnrm: Gen[(Long, Long)] = Gen.frequency(
    1 -> Gen.zip(Gen.const(0L), Gen.const(0L)),
    9 -> (for {
      cnrm <- Gen.chooseNum(1L, Vmax)
      dmax = {
        // float sqrt can land 1 past the exact bound; walk back to it
        var d = math.sqrt(Vmax.toDouble * cnrm.toDouble).toLong
        while (BigInt(d) * d > BigInt(Vmax) * cnrm) d -= 1
        d
      }
      dot <- Gen.chooseNum(-dmax, dmax)
    } yield (dot, cnrm)))

  private def keyOracle(dot: Long, cnrm: Long): Option[BigInt] =
    if (cnrm == 0) None
    else {
      val mag = (BigInt(dot) * BigInt(dot) * BigInt(1000000000L)) / cnrm
      Some(BigInt(dot).sign * mag)
    }

  property("truncationRecall: n_kept is within [0, k] everywhere, and " +
    "prefixDim = dim makes the two rankings identical (n_kept = k " +
    "whenever the corpus has k non-self candidates)") =
    forAll(genClustered) { rows =>
      import spark.implicits._
      val corpus = rows.toDF("vec_id", "embedding")
      val pred = org.apache.spark.sql.functions.col("vec_id") < 4
      val k = 3
      val partial = Similarity.truncationRecall(corpus, "vec_id",
          "embedding", pred, k, prefixDim = 2)
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      val full = Similarity.truncationRecall(corpus, "vec_id",
          "embedding", pred, k, prefixDim = dim)
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      val enough = rows.size - 1 >= k
      partial.forall { case (n, kk) => kk == k && n >= 0 && n <= k } &&
        full.forall { case (n, _) => !enough || n == k }
    }

  property("tripletMargin: pos shares the query's label, neg does not, " +
    "and the flag agrees with the naive double-cosine comparison") =
    forAll(genClustered) { rows =>
      import spark.implicits._
      def lab(id: Long): Int = (id % 2L).toInt
      val df = rows.map { case (id, v) => (id, v, lab(id)) }
        .toDF("vec_id", "embedding", "label")
      val out = Similarity.tripletMargin(df, "vec_id", "embedding",
          "label", org.apache.spark.sql.functions.col("vec_id") < 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3))))
      def quant(v: Seq[Float]): Seq[Long] =
        v.map(x => math.round(x.toDouble * Similarity.Scale))
      val byId = rows.toMap
      out.forall { case (qid, pid, nid, flag) =>
        val q = quant(byId(qid))
        def dotNorm(cid: Long): (BigInt, BigInt) = {
          val c = quant(byId(cid))
          (BigInt(q.zip(c).map { case (a, b) => a * b }.sum),
            BigInt(c.map(x => x * x).sum))
        }
        val (dp, np2) = dotNorm(pid)
        val (dn, nn2) = dotNorm(nid)
        // exact rational compare of dp/sqrt(np2) vs dn/sqrt(nn2) — the
        // same arithmetic the op's integer key implements (shared query
        // norm cancels); sign cases first, squares cross-multiplied
        val posGreater =
          if (np2 == 0 || nn2 == 0) flag == null // keyless side -> NULL
          else if (dp >= 0 && dn < 0) true
          else if (dp < 0 && dn >= 0) false
          else if (dp >= 0) dp * dp * nn2 > dn * dn * np2
          else dp * dp * nn2 < dn * dn * np2
        lab(pid) == lab(qid) && lab(nid) != lab(qid) &&
          (if (np2 == 0 || nn2 == 0) flag == null
           else flag != null && (flag == 1L) == posGreater)
      }
    }

  property("exactCosKey == floor(dot^2 * 1e9 / cnrm) with sign, " +
    "computed in arbitrary precision (NULL iff cnrm = 0)") =
    forAll(Gen.listOfN(40, genDotCnrm)) { pairs =>
      import org.apache.spark.sql.functions.col
      import spark.implicits._
      val got = pairs.toDF("dot", "cnrm")
        .select(Similarity.exactCosKey(col("dot"), col("cnrm")).as("k"))
        .collect()
        .map(r => if (r.isNullAt(0)) None else Some(BigInt(r.getDecimal(0).toBigInteger)))
      got.toSeq == pairs.map { case (d, c) => keyOracle(d, c) }
    }

  property("exactCosKey order agrees with the exact rational " +
    "sign(dot)*dot^2/cnrm order whenever the keys differ (ties only " +
    "within one nanounit of ratio)") =
    forAll(Gen.listOfN(20,
      Gen.zip(genDotCnrm.suchThat(_._2 > 0),
        genDotCnrm.suchThat(_._2 > 0)))) { quads =>
      import org.apache.spark.sql.functions.col
      import spark.implicits._
      val rows = quads.map { case ((d1, c1), (d2, c2)) => (d1, c1, d2, c2) }
      val keys = rows.toDF("d1", "c1", "d2", "c2")
        .select(Similarity.exactCosKey(col("d1"), col("c1")).as("k1"),
          Similarity.exactCosKey(col("d2"), col("c2")).as("k2"))
        .collect()
        .map(r => (BigInt(r.getDecimal(0).toBigInteger),
          BigInt(r.getDecimal(1).toBigInteger)))
      // exact rational compare of sign(d)*d^2/c: cross-multiply
      def ratCmp(d1: Long, c1: Long, d2: Long, c2: Long): Int = {
        val s1 = BigInt(d1).sign; val s2 = BigInt(d2).sign
        if (s1 != s2) s1.compare(s2)
        else {
          val l = BigInt(d1) * BigInt(d1) * c2
          val r = BigInt(d2) * BigInt(d2) * c1
          if (s1 >= 0) l.compare(r) else r.compare(l)
        }
      }
      rows.zip(keys).forall { case ((d1, c1, d2, c2), (k1, k2)) =>
        val kc = k1.compare(k2)
        kc == 0 || kc == ratCmp(d1, c1, d2, c2)
      }
    }

  // ADVICE r9: the key's magnitude envelope is now guarded, not just
  // documented — past 38 digits it must throw the DESCRIPTIVE error
  // (never Decimal's bare precision failure, never a silent null), and
  // the boundary itself must be exact.
  property("CosRankKey.key throws a descriptive ArithmeticException " +
    "exactly when dot^2*1e9/|cnrm| reaches 10^38, and stays exact " +
    "just inside the boundary") =
    forAll(Gen.chooseNum(1L, 1000000L)) { cnrm =>
      import graft.expressions.CosRankKey
      // smallest |dot| whose key overflows at this cnrm:
      // dot^2 >= 10^29 * cnrm
      val bound = {
        // smallest d with d^2 >= limit; float sqrt can land either side
        val limit = BigInt(10).pow(29) * cnrm
        var d = math.sqrt(1e29 * cnrm.toDouble).toLong
        while (BigInt(d) * d >= limit) d -= 1
        while (BigInt(d + 1) * (d + 1) < limit) d += 1
        d + 1
      }
      val over =
        try { CosRankKey.key(bound, cnrm); false }
        catch { case e: ArithmeticException =>
          e.getMessage.contains("graft_cos_rank_key overflow") }
      val justInside = BigInt(CosRankKey.key(bound - 1, cnrm)
        .toJavaBigDecimal.toBigInteger) ==
        BigInt(bound - 1) * (bound - 1) * 1000000000L / cnrm
      over && justInside
    }
}
