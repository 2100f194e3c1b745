package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored row for [[TopKAggregate]]: ordered by (score DESC, id ASC)
  * — the id tiebreak makes the order total, so the aggregate is
  * deterministic under any partitioning and merge order. */
case class Scored(score: Double, id: Long)

/** Exact per-group top-k as a MERGEABLE AGGREGATE — the third spelling
  * of the family, and the strongest scale shape for small k:
  *
  *  - the naive window (`row_number() OVER (PARTITION BY g)`) moves every
  *    row of a group through one task;
  *  - [[Rank.groupTopK]] prunes per input partition first, then
  *    exact-ranks k·P survivors (two bounded windows);
  *  - THIS is one hash-aggregate pass: the buffer holds at most k rows,
  *    partial buffers combine map-side before the shuffle (only
  *    #groups × k rows ever move), and merge is associative+commutative
  *    — the same property that makes the group-MinHash sketch (q96)
  *    distributable.
  *
  * The buffer is a sorted Seq capped at k (insertion keeps order; merge
  * is a bounded sorted-merge), encodable by the product encoder so the
  * aggregate runs through ObjectHashAggregate with real partial merge,
  * not a kryo blob. Output: the top-k rows sorted (score DESC, id ASC).
  */
class TopKAggregate(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, "k must be positive")

  private def lt(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] =
    if (buf.sizeIs >= k && lt(buf.last, in)) buf // worse than the cutoff
    else ((buf :+ in).sortWith(lt)).take(k)

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    (b1 ++ b2).sortWith(lt).take(k)

  override def finish(buf: Seq[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

object TopKAggregate {
  /** The aggregate as a DataFrame-callable function:
    * `topK(5)(col("score"), col("id"))`. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregate(k),
      Encoders.product[Scored])
}
