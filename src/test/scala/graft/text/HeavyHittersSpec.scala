package graft.text

import graft.SparkSpec

/** Heavy-hitter exactness: the MG gate is invisible in the output — the
  * result equals the naive full groupBy + threshold on any input and any
  * partitioning, including adversarially skewed and uniform streams. */
class HeavyHittersSpec extends SparkSpec {

  private def naive(texts: Seq[String], k: Int): Map[String, Long] = {
    val toks = texts.flatMap(_.split(" ").filter(_.nonEmpty))
    val n = toks.size.toLong
    toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }.toMap
  }

  private def run(texts: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    val df = texts.toDF("text").repartition(parts)
    CorpusOps.heavyHitters(df, "text", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("skewed stream: exactly the > n/k terms survive, with exact counts") {
    // 'hot' = 500 of 1000 tokens, 'warm' = 300, tail of 200 singletons
    val texts =
      Seq.fill(500)("hot") ++ Seq.fill(300)("warm") ++
        (1 to 200).map(i => s"rare_$i")
    for (parts <- Seq(1, 3, 7)) {
      val got = run(texts.map(t => t), k = 5, parts = parts)
      assert(got === Map("hot" -> 500L, "warm" -> 300L),
        s"parts=$parts")
    }
  }

  test("near-uniform stream: threshold filter discards sketch survivors " +
    "that are not truly heavy") {
    // 10 terms x 10 occurrences: nothing exceeds n/k for k=5; MG WILL
    // emit candidates, the recount must drop them all
    val texts = (1 to 10).flatMap(i => Seq.fill(10)(s"t$i")).map(identity)
    assert(run(scala.util.Random.shuffle(texts), k = 5, parts = 4) === Map())
  }

  test("random corpus matches the naive computation across partitionings") {
    val rnd = new scala.util.Random(99)
    // zipf-ish: term t_i drawn with weight 1/(i+1)
    val vocab = (0 until 50).map(i => s"w$i")
    val weights = vocab.indices.map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val totalW = cum.last
    def draw(): String = {
      val x = rnd.nextDouble() * totalW
      vocab(cum.indexWhere(x <= _))
    }
    val texts = (1 to 200).map(_ => (1 to 20).map(_ => draw()).mkString(" "))
    for (k <- Seq(3, 10, 25); parts <- Seq(2, 5)) {
      assert(run(texts, k, parts) === naive(texts, k), s"k=$k parts=$parts")
    }
  }

  test("the gate's selectivity is observed: candidate rows and total " +
    "tokens surface as the heavy_hitters metric") {
    import spark.implicits._
    val texts = (Seq.fill(50)("hot hot hot") ++
      (1 to 30).map(i => s"rare_$i")).toDF("text")
    val df = CorpusOps.heavyHitters(texts, "text", k = 4)
    df.collect()
    val metrics = df.queryExecution.observedMetrics
    assert(metrics.contains("heavy_hitters"), s"metrics: ${metrics.keys}")
    val row = metrics("heavy_hitters")
    val candidateRows = row.getLong(row.fieldIndex("candidate_rows"))
    val totalTokens = row.getLong(row.fieldIndex("total_tokens"))
    assert(totalTokens === 180L) // 50*3 + 30
    assert(candidateRows >= 1L && candidateRows < totalTokens)
  }

  test("counts include every occurrence even when a candidate emerges in " +
    "only one partition") {
    import spark.implicits._
    // partition-boundary shape: 'x' is heavy only inside the second half,
    // but its global count must include the first half's stray occurrences
    val texts = (Seq.fill(40)("a b c d") ++ Seq.fill(10)("x a") ++
      Seq.fill(50)("x x x x")).toDF("text").coalesce(2)
    val got = CorpusOps.heavyHitters(texts, "text", k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // totals: a=50+... let the naive stand as the witness
    val naiveGot = naive(Seq.fill(40)("a b c d") ++ Seq.fill(10)("x a") ++
      Seq.fill(50)("x x x x"), 3)
    assert(got === naiveGot)
    assert(got.contains("x") && got("x") === 210L)
  }
}
