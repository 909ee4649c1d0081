package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** One scored candidate for per-query top-k (top-level: Spark encoders
  * can't derive inner-class encoders). */
case class ScoredNeighbor(cos: Double, neighbor: Long)

/** Bounded top-k as a typed Aggregator — the scale-safe replacement for
  * `Window.partitionBy(qid)` top-k (round-1 verdict: with Q query vectors
  * the window form makes Q reducers each sort ALL their scored candidates;
  * at 100× data that serializes on a handful of partitions).
  *
  * As an Aggregator it runs as a partial+final ObjectHashAggregate: every
  * input partition reduces to ≤ k candidates per query BEFORE the shuffle,
  * so the exchange moves Q·k rows instead of Q·N — same shape as Spark's
  * own `TakeOrderedAndProject` generalized per group.
  *
  * Ordering: cos desc, neighbor asc (deterministic tiebreak) — identical
  * results to the window formulation it replaces.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredNeighbor, Seq[ScoredNeighbor], Seq[ScoredNeighbor]]
    with Serializable {

  // ascending in this ordering = best first
  private val ord: Ordering[ScoredNeighbor] =
    Ordering.by((s: ScoredNeighbor) => (-s.cos, s.neighbor))

  override def zero: Seq[ScoredNeighbor] = Vector.empty

  override def reduce(b: Seq[ScoredNeighbor],
      a: ScoredNeighbor): Seq[ScoredNeighbor] =
    if (b.length >= k && ord.lteq(b.last, a)) b // worse than current worst
    else ((b :+ a).sorted(ord)).take(k)

  override def merge(b1: Seq[ScoredNeighbor],
      b2: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(b: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] = b

  override def bufferEncoder: Encoder[Seq[ScoredNeighbor]] =
    ExpressionEncoder[Seq[ScoredNeighbor]]()
  override def outputEncoder: Encoder[Seq[ScoredNeighbor]] =
    ExpressionEncoder[Seq[ScoredNeighbor]]()
}
