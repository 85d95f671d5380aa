package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable exact-distinct bitmaps (the dense-id exact analog of HLL,
  * i.e. the roaring-bitmap pattern every OLAP engine ships for
  * COUNT(DISTINCT) rollups): stage 1 aggregates each fine-grained group's
  * id set into a bitset, stage 2 ORs the bitsets up the hierarchy —
  * giving EXACT distinct counts at every rollup level from one pass over
  * the detail rows, where re-counting would rescan the corpus per level.
  *
  * Domain contract: ids must be small dense non-negatives (bitset memory
  * is max_id/8 bytes per group). That is precisely what `x_dense_ids`
  * manufactures at corpus scale — dictionary-encode first, bitmap second.
  * At 100 TB the per-group bitsets stay bounded by the id domain, travel
  * through the shuffle as binary blobs, and OR-merge associatively
  * (partial aggregation applies on the map side like any Aggregator).
  */
object BitmapFns {

  private[graft] def setBit(buf: Array[Long], id: Long): Array[Long] = {
    require(id >= 0 && id < (1L << 31),
      s"bitmap_agg: id out of dense-domain range: $id")
    val w = (id >> 6).toInt
    val out = if (w < buf.length) buf else {
      var n = math.max(buf.length * 2, 8)
      while (n <= w) n *= 2
      java.util.Arrays.copyOf(buf, n)
    }
    out(w) |= 1L << (id & 63)
    out
  }

  private[graft] def orInto(a: Array[Long], b: Array[Long]): Array[Long] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) |= small(i); i += 1 }
    big
  }

  private[graft] def toBytes(words: Array[Long]): Array[Byte] = {
    var n = words.length
    while (n > 0 && words(n - 1) == 0L) n -= 1
    val bb = ByteBuffer.allocate(n * 8).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  private[graft] def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  private[graft] def popcount(words: Array[Long]): Long = {
    var c = 0L; var i = 0
    while (i < words.length) { c += java.lang.Long.bitCount(words(i)); i += 1 }
    c
  }

  /** Stage 1: long ids → serialized bitset (binary). */
  class BitmapAgg extends Aggregator[Long, Array[Long], Array[Byte]] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(buf: Array[Long], id: Long): Array[Long] = setBit(buf, id)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = orInto(a, b)
    def finish(r: Array[Long]): Array[Byte] = toBytes(r)
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Stage 2: serialized bitsets → (exact distinct of the OR, sum of the
    * input bitsets' individual cardinalities). The pair in one pass makes
    * the rollup audit (how much overlap did naive summing double-count)
    * free.
    */
  class BitmapRollup
      extends Aggregator[Array[Byte], (Array[Long], Long), (Long, Long)] {
    def zero: (Array[Long], Long) = (Array.emptyLongArray, 0L)
    def reduce(buf: (Array[Long], Long), bmp: Array[Byte]): (Array[Long], Long) = {
      val w = fromBytes(bmp)
      (orInto(if (buf._1.length >= w.length) buf._1
              else java.util.Arrays.copyOf(buf._1, w.length), w),
        buf._2 + popcount(w))
    }
    def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) =
      (orInto(a._1, b._1), a._2 + b._2)
    def finish(r: (Array[Long], Long)): (Long, Long) = (popcount(r._1), r._2)
    def bufferEncoder: Encoder[(Array[Long], Long)] = ExpressionEncoder()
    def outputEncoder: Encoder[(Long, Long)] = ExpressionEncoder()
  }

  /** `bitmapAgg(col)` → binary bitset of the group's distinct ids. */
  def bitmapAgg: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BitmapAgg, Encoders.scalaLong)

  /** `bitmapRollup(col)` → struct(_1 = exact distinct of OR, _2 = Σ
    * input cardinalities).
    */
  def bitmapRollup: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BitmapRollup, Encoders.BINARY)
}
