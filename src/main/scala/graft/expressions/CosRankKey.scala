package graft.expressions

import java.math.{BigDecimal => JBigDecimal, BigInteger}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the exact centroid-ranking key
  * `sign(dot) * floor(dot^2 * 1e9 / cnrm)` of
  * [[graft.similarity.Similarity.exactCosKey]] — the float-free
  * replacement for per-centroid cosine that keeps IVF cluster
  * assignment bit-identical across engines (the r7/r8 q149 hash-drift
  * fix). The DuckDB oracles compute the same integer in HUGEINT.
  *
  * Why a custom expression (SURVEY.md §7.4 escalation rule): the
  * Column spelling needs DECIMAL(38,0) arithmetic — dot^2 alone is up
  * to 4.1e23 — which Spark executes as a chain of ~8 checked
  * BigDecimal operations per (vector, centroid) pair (multiply,
  * two IntegralDivides, remainder reconstruction, recombine), each
  * with allocation, precision promotion and overflow bookkeeping.
  * Lloyd training and list assignment evaluate the key nCentroids
  * times per corpus row per iteration, and the measured cost of the
  * decimal chain was 2-3x on the whole IVF query family
  * (q32/q92/q149). This kernel computes the identical integer as ONE
  * unscaled BigInteger chain — square, scale by 1e9, one exact
  * 128-by-64-bit floor division — with no per-op precision checks and
  * a single Decimal materialization at the end. Parity with the
  * arbitrary-precision definition is property-pinned in
  * SimilarityProps.
  *
  * Semantics: NULL iff cnrm = 0 (a zero-norm centroid has no cosine
  * to anything; the consumers rank NULLS LAST, mirroring the oracles),
  * else the exact signed integer for any (dot, cnrm) whose magnitude
  * dot²·10⁹/|cnrm| fits DECIMAL(38,0) — i.e. |dot| < 3.16·10¹⁴ even at
  * the worst case cnrm = 1, and far wider for real norms (ADVICE r9:
  * the doc used to claim totality; the precondition is now explicit
  * and GUARDED — an out-of-envelope key throws a descriptive
  * ArithmeticException rather than Decimal's bare precision error or,
  * worse, a silent null that would corrupt NULLS-LAST rankings). All
  * callers quantize to the 1e5 grid with dim ≤ 64, so |dot| ≤
  * 64·(10⁵)² = 6.4·10¹¹ — four decimal orders inside the guard. A
  * negative cnrm — which no caller produces, norms being sums of
  * squares — uses |cnrm|, keeping the division semantics identical to
  * the nonnegative-operand decimal spelling.
  */
case class CosRankKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two bigint inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = DecimalType(38, 0)

  // NULL when cnrm = 0, beyond the usual null-input propagation
  override def nullable: Boolean = true

  override def prettyName: String = "graft_cos_rank_key"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosRankKey.key(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // key() returns null for cnrm = 0 — surface that as SQL NULL
      s"""
         |${ev.value} = graft.expressions.CosRankKey.key($a, $b);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosRankKey =
    copy(left = newLeft, right = newRight)
}

object CosRankKey {
  private val GigaBig = BigInteger.valueOf(1000000000L)
  private val MaxD38 = BigInteger.TEN.pow(38)

  /** The ranking key as a Spark Decimal(38,0), null iff cnrm = 0;
    * throws a descriptive ArithmeticException when dot²·10⁹/|cnrm|
    * exceeds the 38-digit decimal envelope (see class doc). */
  def key(dot: Long, cnrm: Long): Decimal = {
    if (cnrm == 0L) return null
    val d = BigInteger.valueOf(dot)
    val mag = d.multiply(d).multiply(GigaBig)
      .divide(BigInteger.valueOf(cnrm).abs)
    if (mag.compareTo(MaxD38) >= 0)
      throw new ArithmeticException(
        s"graft_cos_rank_key overflow: dot=$dot, cnrm=$cnrm gives " +
          s"dot^2*1e9/|cnrm| = $mag (> 38 digits); the key requires " +
          "|dot| < 3.16e14 at cnrm = 1 — see CosRankKey's scaladoc")
    val signed = if (dot < 0) mag.negate() else mag
    Decimal(new JBigDecimal(signed), 38, 0)
  }

  /** Column-API entry point. */
  def cosRankKey(dot: Column, cnrm: Column): Column =
    Bridge.column(CosRankKey(Bridge.expression(dot), Bridge.expression(cnrm)))
}
