package graft.plans

import graft.expressions.IntDotProduct
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

/** Catalyst optimizer rule applying the library's own escalation policy
  * (SURVEY.md §7.4) automatically: a user who writes the natural
  * higher-order-function spelling of an integer dot product —
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * — gets the codegen'd [[graft.expressions.IntDotProduct]] kernel
  * instead of per-element interpreted lambda evaluation. The rewrite
  * fires only on the exact shape with non-null `array<bigint>` elements
  * and a literal-zero seed, and guards the one semantic divergence:
  * for MISMATCHED array lengths the HOF spelling yields NULL (zip_with
  * NULL-pads, the products propagate) while the kernel would dot the
  * common prefix — so the rewrite emits
  * `if(size(a) = size(b), intdot(a, b), NULL)`, preserving NULL
  * semantics exactly. (ANSI overflow checking is the remaining
  * difference; the quantized-embedding contract — |x| ≲ 1e6 per
  * element — never triggers it.)
  *
  * Install per session via [[GraftOptimizations.install]] (appends to
  * `spark.experimental.extraOptimizations`, the runtime hook) or
  * cluster-wide with
  * `--conf spark.sql.extensions=graft.plans.GraftSparkExtensions`.
  */
object RewriteHofIntDot extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  /** lambda body is exactly `va op vb` (either order) over the lambda's
    * own two variables */
  private def isBinOpOfVars(body: Expression, va: NamedLambdaVariable,
                            vb: NamedLambdaVariable): Boolean = body match {
    case Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _) =>
      Set(x.exprId, y.exprId) == Set(va.exprId, vb.exprId)
    case Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _) =>
      Set(x.exprId, y.exprId) == Set(va.exprId, vb.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(mulBody @ Multiply(_, _, _),
                Seq(mx: NamedLambdaVariable, my: NamedLambdaVariable), _)),
            Literal(0L, LongType),
            LambdaFunction(addBody @ Add(_, _, _),
              Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(fv: NamedLambdaVariable), _))
          if a.deterministic && b.deterministic &&
            isLongArray(a) && isLongArray(b) &&
            isBinOpOfVars(mulBody, mx, my) &&
            isBinOpOfVars(addBody, acc, el) &&
            fin.exprId == fv.exprId =>
        If(EqualTo(Size(a), Size(b)),
          IntDotProduct(a, b), Literal(null, LongType))
    }
}

/** Rewrites the natural whitespace-tokenization spelling —
  *
  *   filter(split(text, ' '), t -> t != '')
  *
  * — to the codegen'd [[graft.expressions.TokensOf]] kernel. `filter` is
  * a higher-order function (always interpreted), and tokenization sits
  * under every text operator, so this single shape is the highest-leverage
  * rewrite after the dot product. Fires only on a literal single-space
  * regex with the default -1 limit (exactly one split semantics) and a
  * lambda that is `v <> ''` / `NOT (v = '')` over the lambda's own
  * variable; [[TokensOf]] is value-identical to that spelling (the
  * TextKernelsSpec parity contract), including empty-run dropping, so no
  * guard expression is needed. */
object RewriteHofTokens extends Rule[LogicalPlan] {

  private def isNotEmptyTest(body: Expression, v: NamedLambdaVariable): Boolean =
    body match {
      case Not(EqualTo(x: NamedLambdaVariable, Literal(s, StringType)))
        if x.exprId == v.exprId => s != null && s.toString.isEmpty
      case Not(EqualTo(Literal(s, StringType), x: NamedLambdaVariable))
        if x.exprId == v.exprId => s != null && s.toString.isEmpty
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayFilter(
            StringSplit(text, Literal(sep, StringType), Literal(-1, _)),
            LambdaFunction(body, Seq(v: NamedLambdaVariable), _))
          if text.deterministic && text.dataType == StringType &&
            sep != null && sep.toString == " " &&
            isNotEmptyTest(body, v) =>
        graft.expressions.TokensOf(text)
    }
}

object GraftOptimizations {
  /** The library's optimizer rules, in application order. */
  val rules: Seq[Rule[LogicalPlan]] = Seq(RewriteHofIntDot, RewriteHofTokens)

  /** Idempotently install the graft optimizer rules on a session. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    val missing = rules.filterNot(cur.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations = cur ++ missing
  }
}

/** `spark.sql.extensions` entry point for config-based deployment. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftOptimizations.rules.foreach(r => ext.injectOptimizerRule(_ => r))
}
