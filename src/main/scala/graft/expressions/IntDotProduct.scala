package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the exact integer dot product of two
  * `array<long>` columns — the hot inner loop of every similarity operator
  * (graft.similarity): quantized cosine scoring evaluates it once per
  * (query, candidate) pair.
  *
  * Why a custom expression (SURVEY.md §7.4 escalation rule — built-ins
  * first, native Expression only when they can't deliver): the built-in
  * spelling `aggregate(zip_with(a, b, _*_), 0L, _+_)` is a higher-order
  * function, which Spark always evaluates interpreted — per element it
  * allocates lambda variables and boxes every product, outside
  * whole-stage codegen. This expression generates a tight primitive loop
  * (`doGenCode`), keeping the scoring kernel inside codegen.
  *
  * Semantics: sum over the common prefix of the two arrays (callers keep
  * dims uniform — [[graft.similarity.Similarity.annTopK]] fail-fasts on
  * mismatch); NULL if either array is NULL. Arithmetic is raw 64-bit (no
  * ANSI overflow check): quantized embeddings are bounded (|x| ≲ 1e6), so
  * 2^63 headroom covers any realistic dimension count.
  */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_int_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var s = 0L
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}

object IntDotProduct {
  /** Column-API entry point. */
  def intDot(a: Column, b: Column): Column =
    Bridge.column(IntDotProduct(Bridge.expression(a), Bridge.expression(b)))
}
