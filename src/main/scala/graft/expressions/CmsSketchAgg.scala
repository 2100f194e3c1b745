package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a NATIVE Catalyst aggregate
  * ([[TypedImperativeAggregate]]) — the §7.4(b) escalation applied to
  * the AGGREGATE surface, one layer deeper than the typed `Aggregator`
  * (TopKAggregate) and the relational build
  * ([[graft.operators.CountMin.sketch]]): the whole depth×width counter
  * matrix IS the aggregation buffer (one `Array[Long]`), updated in
  * place per row, merged by element-wise addition — the canonical
  * mergeable-sketch shape, executed by Spark's ObjectHashAggregate with
  * real map-side partial aggregation. Against the relational build this
  * removes the depth× row explosion and its shuffle: what crosses the
  * wire is ONE fixed-size buffer per partition, the smallest possible
  * state for a 100 TB keyed stream.
  *
  * Hash derivation is IDENTICAL to [[graft.operators.CountMin]] (same
  * [[SignatureKernels.polyHash]], same [[SignatureKernels.polyCoeffs]]
  * affine rows) — q199 pins the equivalence by hash-checking this
  * aggregate's estimates against the SAME DuckDB oracle the relational
  * q138 uses. Null keys are skipped (no cell), like any SQL aggregate.
  */
case class CmsSketchAgg(left: Expression, right: Expression,
                        depth: Int, width: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {
  require(depth > 0 && width > 0, "depth and width must be positive")

  private lazy val (as, bs) = SignatureKernels.polyCoeffs(depth)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string key, bigint weight), got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_sketch"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val k = left.eval(input)
    if (k != null) {
      val w = right.eval(input)
      val wt = if (w == null) 0L else w.asInstanceOf[Long]
      val ph = SignatureKernels.polyHash(k.asInstanceOf[UTF8String])
      var d = 0
      while (d < depth) {
        val bkt = (((as(d) * ph + bs(d)) % SignatureKernels.PolyMod) %
          width).toInt
        buffer(d * width + bkt) += wt
        d += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsSketchAgg =
    copy(left = newLeft, right = newRight)
}

object CmsSketchAgg {
  /** Column surface: `cmsOf(key, weight, d, w)` aggregates to the
    * flattened depth×width counter array (cell (d, w) at index
    * d·width + w). */
  def cmsOf(key: Column, weight: Column, depth: Int, width: Int): Column =
    Bridge.column(CmsSketchAgg(Bridge.expression(key),
      Bridge.expression(weight), depth, width).toAggregateExpression())
}
