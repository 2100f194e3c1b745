package graft.expressions

import graft.SparkSpec
import graft.similarity.Similarity
import org.apache.spark.sql.functions.col

/** The quantization kernel vs the transform/round/cast HOF chain it
  * replaces — bit-for-bit over random floats, rounding ties, specials
  * (NaN, infinities, saturating magnitudes), null elements, and the
  * array<double> overload. */
class QuantizeEmbeddingSpec extends SparkSpec {

  test("graft_quantize == transform(round(cast)) HOF on random floats, " +
    "negative halves, subnormals, zeros, and rounding ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val vecs: Seq[Seq[Float]] = Seq.tabulate(200)(_ =>
      Seq.fill(8)((rnd.nextGaussian() * rnd.nextInt(1000)).toFloat)) ++ Seq(
      Seq(0.0f, -0.0f, Float.MinPositiveValue, -Float.MinPositiveValue),
      // values whose *1e5 product sits at or near .5 in double
      Seq(5e-6f, -5e-6f, 1.5e-5f, -1.5e-5f, 2.5e-5f, -2.5e-5f),
      Seq.empty[Float])
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "emb")
    val rows = df.select(
      Similarity.quantize(col("emb")).as("native"),
      Similarity.quantizeHof(col("emb")).as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("non-finite and over-grid components THROW, like the ANSI cast " +
    "in the HOF chain they replace — never a silent saturation") {
    import spark.implicits._
    for (bad <- Seq(Float.NaN, Float.PositiveInfinity, Float.MaxValue)) {
      val df = Seq(Tuple1(Seq(bad))).toDF("emb")
      val native = intercept[Exception] {
        df.select(Similarity.quantize(col("emb"))).collect()
      }
      assert(native.getMessage != null)
      val hof = intercept[Exception] {
        df.select(Similarity.quantizeHof(col("emb"))).collect()
      }
      assert(hof.getMessage != null)
    }
  }

  test("null elements stay null, a null array is null, and " +
    "array<double> input quantizes identically to its HOF") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(CAST(1.25 AS FLOAT), CAST(NULL AS FLOAT))),
        |  (CAST(NULL AS ARRAY<FLOAT>))
        |AS t(emb)""".stripMargin)
    val rows = df.select(
      Similarity.quantize(org.apache.spark.sql.functions.col("emb"))
        .as("native"),
      Similarity.quantizeHof(org.apache.spark.sql.functions.col("emb"))
        .as("hof")).collect()
    assert(rows(0).getSeq[Any](0) === Seq(125000L, null))
    assert(rows(0).getSeq[Any](0) === rows(0).getSeq[Any](1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    val d = spark.sql(
      "SELECT array(CAST(0.000005 AS DOUBLE), CAST(-0.000005 AS DOUBLE)," +
        " CAST(3.7 AS DOUBLE)) AS emb")
    val dr = d.select(
      Similarity.quantize(org.apache.spark.sql.functions.col("emb"))
        .as("native"),
      Similarity.quantizeHof(org.apache.spark.sql.functions.col("emb"))
        .as("hof")).head()
    assert(dr.getSeq[Long](0) === dr.getSeq[Long](1))
    assert(dr.getSeq[Long](0).last === 370000L)
  }
}
