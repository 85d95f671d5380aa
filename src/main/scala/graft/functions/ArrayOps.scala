package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{shims => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two double arrays as a native Catalyst expression.
  *
  * Why not `aggregate(zip_with(...))`: higher-order functions are
  * interpreted per element (lambda call + boxing per array slot), which
  * made brute-force vector search the single most expensive operator in
  * the suite. This expression compiles to a tight primitive loop inside
  * whole-stage codegen — the preference-(b) extension point from
  * SURVEY.md §4 (compose built-ins < custom Expression < custom plan).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are guaranteed array<double> by the ArrayOps.dot wrapper cast
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double[] $y = $b.toDoubleArray();
         |int $n = Math.min($x.length, $y.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $x[$i] * $y[$i]; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED long arrays — a single merge scan,
  * O(|A|+|B|), codegen'd. Backs near-dup candidate verification: per-doc
  * shingle sets become sorted hash arrays once, and each candidate pair
  * costs one scan instead of a row-exploding join on shingle equality.
  */
case class SortedLongArrayIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val y = b.asInstanceOf[ArrayData].toLongArray()
    var i = 0; var j = 0; var n = 0L
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { n += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      s"""
         |long[] $x = $a.toLongArray();
         |long[] $y = $b.toLongArray();
         |int $i = 0; int $j = 0; long $n = 0L;
         |while ($i < $x.length && $j < $y.length) {
         |  if ($x[$i] == $y[$j]) { $n++; $i++; $j++; }
         |  else if ($x[$i] < $y[$j]) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All unordered pairs of a SORTED-DISTINCT long array, each packed as
  * (a << 32) | b with a < b — the pair-generation kernel for
  * co-occurrence counting (common neighbors, co-purchase). Emitting the
  * k(k-1)/2 pairs as ONE primitive array per group (then `explode`)
  * replaces the equi-self-join: no second read of the edge frame, and
  * the downstream count groups on a SINGLE long key (Spark's fastest
  * hash-agg path). Inputs must be nonnegative ints stored as longs
  * (< 2^31), so the packing is collision-free and unpack is two shifts.
  */
object PackedPairsImpl {
  def compute(xs: Array[Long]): Array[Long] = {
    val k = xs.length
    val out = new Array[Long](k * (k - 1) / 2)
    var n = 0
    var i = 0
    while (i < k) {
      val hi = xs(i) << 32
      var j = i + 1
      while (j < k) { out(n) = hi | xs(j); n += 1; j += 1 }
      i += 1
    }
    out
  }
}

case class SortedLongArrayPackedPairs(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      PackedPairsImpl.compute(a.asInstanceOf[ArrayData].toLongArray()))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.PackedPairsImpl.compute($a.toLongArray()));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature of a hash-set array in ONE pass — n_hashes mins
  * computed per element with an inline splitmix64-style remix, no
  * intermediate arrays. Replaces nested higher-order functions, which
  * Spark evaluates INTERPRETED (ArrayTransform is CodegenFallback:
  * per-element lambda dispatch + boxing) — the hot path of every LSH
  * query. The family choice is internal: exact-Jaccard verification
  * anchors the final answers, so any good 64-bit mixer preserves both
  * correctness and the banding miss-probability bound.
  */
object MinHashSigImpl {
  // per-family seeds from splitmix64 of the family index (deterministic)
  private val SEEDS: Array[Long] = Array.tabulate(64) { i =>
    var z = i.toLong + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def compute(hs: Array[Long], n: Int): Array[Long] = {
    val out = Array.fill(n)(Long.MaxValue)
    var j = 0
    while (j < hs.length) {
      val h = hs(j)
      var i = 0
      while (i < n) {
        // murmur3 fmix64 of (h ^ seed_i): full avalanche per family
        var x = h ^ SEEDS(i)
        x = (x ^ (x >>> 33)) * 0xFF51AFD7ED558CCDL
        x = (x ^ (x >>> 33)) * 0xC4CEB9FE1A85EC53L
        x ^= x >>> 33
        if (x < out(i)) out(i) = x
        i += 1
      }
      j += 1
    }
    out
  }
}

case class MinHashSignature(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  // SEEDS has 64 entries; fail at plan time, not deep inside codegen
  require(numHashes >= 1 && numHashes <= 64,
    s"MinHashSignature: numHashes must be in [1, 64], got $numHashes")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      MinHashSigImpl.compute(a.asInstanceOf[ArrayData].toLongArray(), numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinHashSigImpl.compute($a.toLongArray(), $numHashes));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row shingle-set hashing: text → SORTED DISTINCT array of the
  * xxhash64 (seed 42) of every k-gram — the whole near-dup "sets" stage
  * as ONE narrow expression.
  *
  * Why this exists: the explode → groupBy(doc_id) → collect_set spelling
  * shuffles the shingle stream — the LARGEST intermediate of every LSH
  * query — just to reassemble rows that were together to begin with.
  * Computing the set per row removes that shuffle entirely; at 100 TB
  * the dedup pipeline's biggest exchange simply disappears.
  *
  * Hash parity: a k-word shingle joined with single spaces is
  * byte-identical to the corresponding substring of the original text
  * (split-on-space keeps empty tokens, so rejoining reproduces the
  * source bytes), so hashing the source byte range equals
  * `xxhash64(concat_ws(' ', ...))` — the values interoperate with sets
  * built by the exploded path, and no per-shingle string is ever
  * allocated.
  */
object ShingleHashImpl {
  private val SEED = 42L

  private def sortedDistinct(a: Array[Long], n: Int): Array[Long] = {
    val t = java.util.Arrays.copyOf(a, n)
    java.util.Arrays.sort(t)
    var w = 0
    var i = 0
    while (i < t.length) {
      if (w == 0 || t(w - 1) != t(i)) { t(w) = t(i); w += 1 }
      i += 1
    }
    if (w == t.length) t else java.util.Arrays.copyOf(t, w)
  }

  /** k-word shingles (split on single space, empty tokens kept — the
    * split()/concat_ws() semantics). Empty array when the text has
    * fewer than k words.
    */
  def wordGrams(s: org.apache.spark.unsafe.types.UTF8String, k: Int): Array[Long] = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    // word start offsets: 0 and every byte after a 0x20 (never part of a
    // multi-byte UTF-8 sequence)
    var nWords = 1
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') nWords += 1
      i += 1
    }
    if (nWords < k) return Array.emptyLongArray
    val starts = new Array[Int](nWords)
    var w = 1
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') {
        starts(w) = i + 1; w += 1
      }
      i += 1
    }
    val out = new Array[Long](nWords - k + 1)
    i = 0
    while (i <= nWords - k) {
      val from = starts(i)
      // end of word i+k-1: next word's start minus the space, or text end
      val until = if (i + k < nWords) starts(i + k) - 1 else len
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + from, until - from, SEED)
      i += 1
    }
    sortedDistinct(out, out.length)
  }

  /** k-char (codepoint) shingles — the substring(text, i, k) semantics.
    * Empty array when the text has fewer than k chars.
    */
  def charGrams(s: org.apache.spark.unsafe.types.UTF8String, k: Int): Array[Long] = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    // codepoint start offsets
    var n = 0
    var i = 0
    while (i < len) {
      i += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + i))
      n += 1
    }
    if (n < k) return Array.emptyLongArray
    val starts = new Array[Int](n + 1)
    var c = 0
    i = 0
    while (i < len) {
      starts(c) = i
      i += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + i))
      c += 1
    }
    starts(n) = len
    val out = new Array[Long](n - k + 1)
    i = 0
    while (i <= n - k) {
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + starts(i), starts(i + k) - starts(i), SEED)
      i += 1
    }
    sortedDistinct(out, out.length)
  }
}

/** Per-row winnowing (Schleimer/Wilkerson/Aiken 2003): md5 digests of the
  * k-word shingles, minimum per w-long sliding window, distinct — the
  * whole fingerprint SET computed inside one codegen'd projection, so
  * x_winnow_fingerprint's plan is a narrow map + one digest agg instead
  * of an exploded gram stream exchanged and window-sorted per doc.
  * md5 (not the xxhash the LSH family uses) deliberately: the DuckDB
  * oracle must reproduce the identical min-selection, and md5 is the
  * one digest both engines spell identically. Hex strings compare
  * bytewise identically in UTF8String, java.lang.String, and DuckDB's
  * binary varchar collation, so the per-window min agrees everywhere.
  */
object WinnowImpl {
  // one digest per task thread, not per row — getInstance is a JCA
  // provider lookup + allocation, pure overhead on the per-row hot path
  private val localMd =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def winnow(s: org.apache.spark.unsafe.types.UTF8String,
      k: Int, w: Int): Array[AnyRef] = {
    val words = s.toString.split(" ", -1)
    if (words.length < k) return Array.empty
    val g = words.length - k + 1
    val hs = new Array[String](g)
    val md = localMd.get()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < g) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j)); j += 1
      }
      md.reset()
      hs(i) = hex(md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      i += 1
    }
    val set = new java.util.TreeSet[String]()
    var j = 0
    while (j < g) {
      var m = hs(j)
      var t = j + 1
      val end = math.min(j + w, g)
      while (t < end) { if (hs(t).compareTo(m) < 0) m = hs(t); t += 1 }
      set.add(m)
      j += 1
    }
    val out = new Array[AnyRef](set.size)
    val it = set.iterator()
    var idx = 0
    while (it.hasNext) {
      out(idx) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      idx += 1
    }
    out
  }

  private def hex(d: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      val v = d(i) & 0xff
      sb.append("0123456789abcdef".charAt(v >> 4))
      sb.append("0123456789abcdef".charAt(v & 0xf))
      i += 1
    }
    sb.toString
  }
}

case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(k >= 1 && w >= 1, s"WinnowFingerprints: k, w must be >= 1")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      WinnowImpl.winnow(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.WinnowImpl.winnow($a, $k, $w));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WordShingleHashes(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(k >= 1, s"WordShingleHashes: k must be >= 1, got $k")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ShingleHashImpl.wordGrams(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.ShingleHashImpl.wordGrams($a, $k));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class CharShingleHashes(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(k >= 1, s"CharShingleHashes: k must be >= 1, got $k")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ShingleHashImpl.charGrams(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.ShingleHashImpl.charGrams($a, $k));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayOps {

  /** Column form of WordShingleHashes. */
  def wordShingleHashes(text: Column, k: Int): Column =
    ExpressionUtils.column(WordShingleHashes(
      ExpressionUtils.expression(text), k))

  /** Column form of WinnowFingerprints. */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowFingerprints(
      ExpressionUtils.expression(text), k, w))

  /** Column form of CharShingleHashes. */
  def charShingleHashes(text: Column, k: Int): Column =
    ExpressionUtils.column(CharShingleHashes(
      ExpressionUtils.expression(text), k))

  /** Column form of MinHashSignature. */
  def minhashSignature(hs: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSignature(
      ExpressionUtils.expression(hs), numHashes))

  /** Column form of SortedLongArrayPackedPairs (sorted-distinct input,
    * values < 2^31). */
  def packedPairs(a: Column): Column =
    ExpressionUtils.column(SortedLongArrayPackedPairs(
      ExpressionUtils.expression(a)))

  /** Column form of SortedLongArrayIntersect (inputs must be sorted). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedLongArrayIntersect(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column-level dot product (inputs cast to array of double). */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(ArrayDotProduct(
      ExpressionUtils.expression(a.cast("array<double>")),
      ExpressionUtils.expression(b.cast("array<double>"))))

  /** L2-normalize a vector column (one pass; the norm is a dot with
    * itself through the same codegen'd expression).
    */
  def l2normalize(v: Column): Column = {
    val d = v.cast("array<double>")
    transform(d, x => x / sqrt(dot(d, d)))
  }
}
