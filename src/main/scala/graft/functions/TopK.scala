package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) candidate row feeding a bounded per-group top-k. */
final case class ScoredId(score: Long, id: Long)

/** Bounded per-group top-k as a typed Aggregator — the partial-aggregation
  * escape for the "keep N best rows per group" shape.
  *
  * The window spelling (`row_number() OVER (PARTITION BY g ORDER BY s)`)
  * must shuffle EVERY row to its group's partition and sort it there: at
  * 100 TB the shuffle is corpus-sized and a hot group (one giant web
  * domain) serializes on a single task. This Aggregator runs inside
  * ObjectHashAggregate with map-side partials: each input partition
  * contributes at most k rows per group to the shuffle, so the exchange
  * is bounded by k × partitions × groups regardless of row count, and no
  * single task ever sees a whole group's rows.
  *
  * Ordering contract: score DESC, then id ASC (deterministic under score
  * ties). The buffer is kept sorted best-first and never exceeds k
  * entries, so reduce is O(k) per row (binary-search-free insertion on a
  * tiny array) and merge is a bounded O(k) two-pointer merge.
  */
class TopKByScore(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  def zero: Seq[ScoredId] = Vector.empty

  def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] =
    if (buf.length >= k && better(buf.last, x)) buf
    else {
      // Single-allocation sorted insertion: one Array[≤k] filled in one
      // pass (entries better than x, then x, then the rest up to k).
      // The earlier take/:+/++ spelling built 4 intermediate Vectors per
      // accepted row — pure GC churn on the map-side hot path.
      val n = math.min(buf.length + 1, k)
      val out = new Array[ScoredId](n)
      var i = 0; var p = 0
      while (i < buf.length && better(buf(i), x)) {
        out(p) = buf(i); p += 1; i += 1
      }
      if (p < n) { out(p) = x; p += 1 }
      while (p < n) { out(p) = buf(i); p += 1; i += 1 }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }

  def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] = {
    // two-pointer merge of two sorted ≤k buffers, capped at k
    val out = Vector.newBuilder[ScoredId]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && better(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}

object TopKByScore {
  /** Column-level handle: `topK(3)(col("score"), col("id"))` returns an
    * array<struct<score,id>> of the group's k best rows.
    */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new TopKByScore(k), ExpressionEncoder[ScoredId]())
}
