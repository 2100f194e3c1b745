package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the scalar quantization every
  * similarity operator performs FIRST on every embedding it touches:
  * `array<float|double>` → `array<long>` of `round(x · 1e5)` — the
  * [[graft.similarity.Similarity.quantize]] grid.
  *
  * Why a custom expression (SURVEY.md §7.4 escalation rule): the
  * built-in spelling `transform(emb, x -> cast(round(cast(x as double)
  * * 1e5) as long))` is a higher-order function — Spark evaluates it
  * INTERPRETED, allocating lambda variables and boxing per element, and
  * it sits upstream of every intDot in the scoring hot path. This is
  * one primitive loop inside whole-stage codegen.
  *
  * Semantics replicate the HOF chain element-for-element under the
  * engine's ANSI sessions (parity-pinned in QuantizeEmbeddingSpec):
  * `round(double, 0)` is Spark's HALF_UP decimal rounding, and the ANSI
  * long cast THROWS on NaN/Infinity/out-of-range — mirrored here with a
  * descriptive ArithmeticException (an embedding component would need
  * |x| > ~9.2e13 to overflow the 1e5 grid, so a throw means corrupt
  * input, and failing fast beats silently saturating a score). NULL
  * elements stay NULL (the HOF's null-propagating lambda); a NULL array
  * is NULL. */
case class QuantizeEmbedding(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got " +
        other.simpleString)
  }

  private def childNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def dataType: DataType = ArrayType(LongType, childNullable)

  override def prettyName: String = "graft_quantize"

  // def, not val: dataType is only legal on a RESOLVED child, and the
  // analyzer copies this node (withNewChildInternal) before resolution
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any): Any =
    QuantizeEmbedding.quantize(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.QuantizeEmbedding" +
        s".quantize($a, $isFloat);")

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeEmbedding = copy(child = newChild)
}

object QuantizeEmbedding {
  private val Scale = 100000.0

  /** One element of the chain `cast(round(x·1e5, 0) as long)` exactly as
    * Spark's built-ins compute it under ANSI: Round(DoubleType) passes
    * NaN/Infinity through untouched and otherwise takes
    * `BigDecimal(d).setScale(0, HALF_UP).toDouble` (scala.math.BigDecimal
    * wraps java.math.BigDecimal.valueOf — the canonical Double.toString
    * representation, so ties land exactly where the built-in lands
    * them); the ANSI Cast(double→long) throws on any value outside the
    * long range, NaN and infinities included. */
  def roundToLong(d: Double): Long = {
    val r =
      if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
      else scala.math.BigDecimal(d)
        .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    if (java.lang.Double.isNaN(r) ||
        r < Long.MinValue.toDouble || r > Long.MaxValue.toDouble)
      // the SAME SparkArithmeticException (error class CAST_OVERFLOW) the
      // replaced ANSI cast chain throws — callers matching on Spark error
      // classes (or TRY-wrapped paths) behave identically to the HOF
      // spelling. An embedding component would need |x| > ~9.2e13 on the
      // 1e5 grid to get here, so a throw means corrupt input.
      throw Bridge.castOverflowError(r, DoubleType, LongType)
    r.toLong
  }

  def quantize(arr: ArrayData, isFloat: Boolean): ArrayData = {
    val m = arr.numElements()
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val d = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) = java.lang.Long.valueOf(roundToLong(d * Scale))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def quantizeOf(emb: Column): Column =
    Bridge.column(QuantizeEmbedding(Bridge.expression(emb)))
}
