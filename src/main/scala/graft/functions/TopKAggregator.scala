package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Exact grouped top-k as a typed [[Aggregator]]: the buffer holds at most
  * k (score, id) pairs, so partial aggregation bounds both memory and
  * shuffle payload at k per group per partition — the map-side-combine
  * shape that a window + row_number can't give you when groups are huge.
  * Ordering is (score desc, id asc): fully deterministic under ties.
  */
object TopKAggregator {

  final case class Scored(score: Double, id: Long)

  /** Ordering: best score first; id breaks ties. `+ 0.0` collapses -0.0
    * onto 0.0 so the tie-break matches SQL semantics (where -0.0 = 0.0)
    * instead of IEEE total order. */
  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-(s.score + 0.0), s.id))

  final class TopK[IN](k: Int, f: IN => Scored)
      extends Aggregator[IN, Seq[Scored], Seq[Scored]] {
    // Fail at construction (driver side): with k <= 0 the `b.last` probe in
    // reduce would NPE-style blow up inside executor tasks instead.
    require(k >= 1, s"TopK requires k >= 1, got $k")
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

  /** Untyped (Column) form of [[TopK]] for DataFrame pipelines:
    * `groupBy(g).agg(topKColumn(k)(score, id))` yields the ≤k best
    * (score desc, id asc) pairs per group as a best-first
    * `array<struct<score:double, id:long>>`. Same bounded-buffer
    * guarantee as the typed form — the partial aggregate ships at most
    * k pairs per group per map task. */
  def topKColumn(k: Int): UserDefinedFunction =
    udaf(topK[(Double, Long)](k)(t => Scored(t._1, t._2)),
      ExpressionEncoder[(Double, Long)]())

  /** String-keyed variant for hash-ordered sampling: keeps the k SMALLEST
    * (key, id) pairs per group — the md5-sample shape (`ORDER BY md5(..)
    * LIMIT k` per stratum) with the same bounded buffer guarantee. */
  final case class Keyed(key: String, id: Long)

  private val kord: Ordering[Keyed] =
    Ordering.by((s: Keyed) => (s.key, s.id))

  final class MinK[IN](k: Int, f: IN => Keyed)
      extends Aggregator[IN, Seq[Keyed], Seq[Keyed]] {
    require(k >= 1, s"MinK requires k >= 1, got $k")
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

  /** Untyped (Column) form of [[MinK]]:
    * `groupBy(g).agg(minKColumn(k)(key, id))` yields the ≤k smallest
    * (key asc, id asc) pairs per group as a first-is-smallest
    * `array<struct<key:string, id:long>>`. */
  def minKColumn(k: Int): UserDefinedFunction =
    udaf(minK[(String, Long)](k)(t => Keyed(t._1, t._2)),
      ExpressionEncoder[(String, Long)]())

  /** STRING-identified top-k — [[TopK]] for groups ranked by (score
    * desc, string id asc): the tf-idf top-terms shape, where the ranked
    * thing is a term, not a numeric id. Same bounded-buffer guarantee:
    * ≤ k (score, sid) pairs per group per map task. */
  final case class ScoredS(score: Double, sid: String)

  private val sord: Ordering[ScoredS] =
    Ordering.by((s: ScoredS) => (-(s.score + 0.0), s.sid))

  final class TopKS[IN](k: Int, f: IN => ScoredS)
      extends Aggregator[IN, Seq[ScoredS], Seq[ScoredS]] {
    require(k >= 1, s"TopKS requires k >= 1, got $k")
    override def zero: Seq[ScoredS] = Seq.empty
    override def reduce(b: Seq[ScoredS], in: IN): Seq[ScoredS] = {
      val a = f(in)
      if (b.sizeIs >= k && sord.gteq(a, b.last)) b
      else (b :+ a).sorted(sord).take(k)
    }
    override def merge(x: Seq[ScoredS], y: Seq[ScoredS]): Seq[ScoredS] =
      (x ++ y).sorted(sord).take(k)
    override def finish(r: Seq[ScoredS]): Seq[ScoredS] = r
    override def bufferEncoder: Encoder[Seq[ScoredS]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[ScoredS]] = ExpressionEncoder()
  }

  /** Untyped (Column) form of [[TopKS]]:
    * `groupBy(g).agg(topKStrColumn(k)(score, sid))` yields the ≤k best
    * (score desc, sid asc) pairs per group, best first, as
    * `array<struct<score:double, sid:string>>`. */
  def topKStrColumn(k: Int): UserDefinedFunction =
    udaf(new TopKS[(Double, String)](k, t => ScoredS(t._1, t._2)),
      ExpressionEncoder[(Double, String)]())
}
