package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact grouped top-k as a typed [[Aggregator]]: the buffer holds at most
  * k (score, id) pairs, so partial aggregation bounds both memory and
  * shuffle payload at k per group per partition — the map-side-combine
  * shape that a window + row_number can't give you when groups are huge.
  * Ordering is (score desc, id asc): fully deterministic under ties.
  */
object TopKAggregator {

  final case class Scored(score: Double, id: Long)

  /** Ordering: best score first; id breaks ties. */
  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  final class TopK[IN](k: Int, f: IN => Scored)
      extends Aggregator[IN, Seq[Scored], Seq[Scored]] {
    override def zero: Seq[Scored] = Seq.empty
    override def reduce(b: Seq[Scored], in: IN): Seq[Scored] = {
      val a = f(in)
      if (b.sizeIs >= k && ord.gteq(a, b.last)) b   // can't displace anything
      else (b :+ a).sorted(ord).take(k)
    }
    override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
      (x ++ y).sorted(ord).take(k)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  def topK[IN](k: Int)(f: IN => Scored): TopK[IN] = new TopK(k, f)

  /** String-keyed variant for hash-ordered sampling: keeps the k SMALLEST
    * (key, id) pairs per group — the md5-sample shape (`ORDER BY md5(..)
    * LIMIT k` per stratum) with the same bounded buffer guarantee. */
  final case class Keyed(key: String, id: Long)

  private val kord: Ordering[Keyed] =
    Ordering.by((s: Keyed) => (s.key, s.id))

  final class MinK[IN](k: Int, f: IN => Keyed)
      extends Aggregator[IN, Seq[Keyed], Seq[Keyed]] {
    override def zero: Seq[Keyed] = Seq.empty
    override def reduce(b: Seq[Keyed], in: IN): Seq[Keyed] = {
      val a = f(in)
      if (b.sizeIs >= k && kord.gteq(a, b.last)) b   // can't displace anything
      else (b :+ a).sorted(kord).take(k)
    }
    override def merge(x: Seq[Keyed], y: Seq[Keyed]): Seq[Keyed] =
      (x ++ y).sorted(kord).take(k)
    override def finish(r: Seq[Keyed]): Seq[Keyed] = r
    override def bufferEncoder: Encoder[Seq[Keyed]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Keyed]] = ExpressionEncoder()
  }

  def minK[IN](k: Int)(f: IN => Keyed): MinK[IN] = new MinK(k, f)
}
