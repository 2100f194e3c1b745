package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen membership probe against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] over LONG keys — the
  * per-row gate of Bloom-prefiltered operators
  * ([[graft.text.CorpusOps.decontaminateBloom]]).
  *
  * Why long keys: `BloomFilter.putLong`/`mightContainLong` is a
  * well-defined primitive path on both the build and probe side — no
  * string-encoding ambiguity — so callers hash arbitrary keys to longs
  * (`xxhash64`) first. Hash collisions only ever ADD false positives,
  * which Bloom semantics already require callers to tolerate (or verify
  * away exactly, as decontaminateBloom does); they can never create a
  * false negative.
  *
  * The filter rides into generated code via `addReferenceObj` — one
  * deserialized sketch per executor referenced from the task binary, not
  * re-parsed per row, and the probe stays inside whole-stage codegen. */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainLong = copy(child = newChild)
}

object BloomMightContainLong {
  /** Column-API entry point: `mightContain(xxhash64(key), bloom)`. */
  def mightContain(hashed: Column, bloom: BloomFilter): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(hashed), bloom))
}
