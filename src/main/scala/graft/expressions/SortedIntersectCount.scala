package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for |A ∩ B| of two SORTED-ASCENDING,
  * duplicate-free `array<string>` OR `array<bigint>` columns — the exact-
  * verification inner loop of the set-similarity family (graft.dedup):
  * every candidate pair that survives blocking pays one intersection to
  * compute its true Jaccard.
  *
  * Why a custom expression (SURVEY.md §7.4 escalation rule): the built-in
  * `size(array_intersect(a, b))` builds a hash set of one side PER ROW —
  * per-pair allocation plus hashing of every element. With both sides
  * pre-sorted once per DOCUMENT (array_sort at shingle-set creation, paid
  * |corpus| times), the per-PAIR cost collapses to an allocation-free
  * two-pointer merge walk, and it stays inside whole-stage codegen.
  *
  * The long-array overload exists for guide §5 reasons, not convenience:
  * the string walk's `getUTF8String(i)` allocates one UTF8String PER
  * ELEMENT ACCESS — at millions of candidate pairs × ~100 elements each
  * that is ~10⁹ short-lived allocations in one stage (measured on q130:
  * 9-11 s of summed GC in a 5 s stage). `getLong(i)` reads the unsafe
  * buffer directly: zero allocation, and a long compare instead of a
  * byte-wise string compare.
  *
  * Contract: both inputs sorted ascending in the element type's order
  * (`array_sort`'s order) with distinct elements — the shape
  * `Dedup.blockedPostings` produces. Unsorted input under-counts; this is
  * a kernel for the operator's internal discipline, not a general
  * function. NULL if either side is NULL; parity with
  * `size(array_intersect)` on that shape is property-pinned in
  * SortedIntersectSpec.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def longMode: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> or two array<bigint> " +
          s"inputs, got ${left.dataType.simpleString} and " +
          s"${right.dataType.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_sorted_intersect"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    if (longMode) {
      while (i < nx && j < ny) {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv == yv) { c += 1L; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    } else {
      while (i < nx && j < ny) {
        val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1L; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val body =
        if (longMode) {
          val xv = ctx.freshName("xv")
          val yv = ctx.freshName("yv")
          s"""
             |while ($i < $nx && $j < $ny) {
             |  long $xv = $a.getLong($i);
             |  long $yv = $b.getLong($j);
             |  if ($xv == $yv) { $c++; $i++; $j++; }
             |  else if ($xv < $yv) { $i++; } else { $j++; }
             |}
           """.stripMargin
        } else {
          val cmp = ctx.freshName("cmp")
          s"""
             |while ($i < $nx && $j < $ny) {
             |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
             |  if ($cmp == 0) { $c++; $i++; $j++; }
             |  else if ($cmp < 0) { $i++; } else { $j++; }
             |}
           """.stripMargin
        }
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |$body
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column-API entry point — callers guarantee sorted distinct inputs. */
  def sortedIntersect(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(
      Bridge.expression(a), Bridge.expression(b)))
}
