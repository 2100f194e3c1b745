package graft.plans

import graft.expressions.IntDotProduct
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}

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

/** Rewrites a thresholded edit-distance predicate — the natural user
  * spelling `levenshtein(a, b) <= d` (also `<`, and the operand-flipped
  * forms) with a small integer literal threshold — to the banded
  * [[graft.expressions.BoundedLevenshtein]] kernel: O(d·len) with an
  * early whole-band exit, vs the built-in's full O(len²) table. The
  * kernel is exact for every distance ≤ its threshold and saturates at
  * threshold+1, so each rewritten comparison decides identically on
  * every input (TextKernelsSpec pins value parity; q115 drives the rule
  * end-to-end against q110's oracle). Only the COMPARISON is rewritten —
  * a bare `levenshtein(a, b)` projected as a value keeps the built-in
  * (the full distance is observable there). Spark's own 3-arg
  * `levenshtein(a, b, threshold)` (returns −1 beyond the threshold) is
  * the built-in alternative for new code; this rule exists for the
  * predicate form users actually write. */
object RewriteBoundedLevenshtein extends Rule[LogicalPlan] {
  private val MaxThreshold = 64

  /** A full (un-thresholded) levenshtein over deterministic string
    * inputs, possibly under the analyzer's widening cast to long. */
  private object Lev {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Levenshtein(a, b, None)
        if a.deterministic && b.deterministic &&
          a.dataType == StringType && b.dataType == StringType =>
        Some((a, b))
      case Cast(Levenshtein(a, b, None), LongType, _, _)
        if a.deterministic && b.deterministic &&
          a.dataType == StringType && b.dataType == StringType =>
        Some((a, b))
      case _ => None
    }
  }

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case Literal(v: Long, LongType) if v.isValidInt => Some(v.toInt)
      case _ => None
    }
  }

  private def kernel(a: Expression, b: Expression, d: Int): Expression =
    graft.expressions.BoundedLevenshtein(a, b, d)
  private def litL(d: Int): Literal = Literal(d.toLong, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // dist <= d: band d (saturation d+1 > d decides false, as it must)
      case LessThanOrEqual(Lev(a, b), IntLit(d))
          if d >= 0 && d <= MaxThreshold =>
        LessThanOrEqual(kernel(a, b, d), litL(d))
      case GreaterThanOrEqual(IntLit(d), Lev(a, b))
          if d >= 0 && d <= MaxThreshold =>
        GreaterThanOrEqual(litL(d), kernel(a, b, d))
      // dist < d ⟺ dist <= d−1: band d−1 (saturation d is not < d)
      case LessThan(Lev(a, b), IntLit(d)) if d >= 1 && d <= MaxThreshold =>
        LessThan(kernel(a, b, d - 1), litL(d))
      case GreaterThan(IntLit(d), Lev(a, b)) if d >= 1 && d <= MaxThreshold =>
        GreaterThan(litL(d), kernel(a, b, d - 1))
    }
}

object GraftOptimizations {
  /** The library's optimizer rules, in application order. */
  val rules: Seq[Rule[LogicalPlan]] =
    Seq(RewriteHofIntDot, RewriteHofTokens, RewriteBoundedLevenshtein)

  /** Idempotently install the graft optimizer rules AND planner
    * strategies (GroupTopKPlan's whole-operator path) on a session. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    val missing = rules.filterNot(cur.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations = cur ++ missing
    val curS = spark.experimental.extraStrategies
    if (!curS.contains(GroupTopKPlan.GroupTopKStrategy))
      spark.experimental.extraStrategies =
        curS :+ GroupTopKPlan.GroupTopKStrategy
  }
}

/** `spark.sql.extensions` entry point for config-based deployment. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftOptimizations.rules.foreach(r => ext.injectOptimizerRule(_ => r))
    ext.injectPlannerStrategy(_ => GroupTopKPlan.GroupTopKStrategy)
  }
}
