package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.{shims => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row unigram-LM Viterbi segmentation under a fixed integer
  * log-prob vocabulary: returns struct(n_pieces, score_fix, seg) for one
  * word.
  *
  * This is the WinnowFingerprints lesson re-applied: the DP state for
  * one word fits a row, so the whole forward pass + tie-aware backward
  * reconstruction runs inside a single projection expression. The
  * first spelling — an UNROLLED column pipeline (one b/n/piece/pos
  * column per position) — was semantically identical but paid tens of
  * Catalyst analysis passes over a plan whose expression trees grew
  * with every step: measured 20+ SECONDS of pure driver time per
  * training run over a 31-row histogram, against microseconds of
  * actual evaluation.
  *
  * Semantics (must stay bit-identical to the DuckDB oracle's layered
  * CTE spelling): maximize the integer log-prob sum; among score ties
  * keep the FEWEST pieces; reconstruct backward taking the LONGEST
  * piece consistent with the (score, pieces) optimum at each step.
  * Pieces are substrings of length 1..maxPiece present in `lp`; every
  * single character of the corpus is in the vocabulary by construction,
  * so every position is reachable.
  *
  * Evaluation is interpreted (CodegenFallback) — the input is the
  * word HISTOGRAM (vocabulary-sized), never the corpus, so codegen
  * would buy nothing.
  */
case class UnigramSegment(child: Expression, lp: Map[String, Long],
    maxPiece: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("score_fix", LongType, nullable = false),
    StructField("seg", StringType, nullable = false)))

  override def nullSafeEval(a: Any): Any = {
    val w = a.asInstanceOf[UTF8String].toString
    val (np, score, seg) = UnigramSegment.segment(w, lp, maxPiece)
    InternalRow(np, score, UTF8String.fromString(seg))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramSegment {
  private val NEG = -1000000000000L

  /** (n_pieces, score_fix, seg) for one word — the reference DP, also
    * called directly by the spec's exhaustive-search comparison.
    */
  def segment(w: String, lp: Map[String, Long], maxPiece: Int)
      : (Long, Long, String) = {
    val n = w.length
    val b = Array.fill(n + 1)(NEG)
    val np = Array.fill(n + 1)(Long.MaxValue)
    b(0) = 0L; np(0) = 0L
    var i = 1
    while (i <= n) {
      var bi = NEG
      var l = 1
      while (l <= math.min(maxPiece, i)) {
        lp.get(w.substring(i - l, i)).foreach { v =>
          val sc = b(i - l) + v
          if (sc > bi) bi = sc
        }
        l += 1
      }
      var ni = Long.MaxValue
      l = 1
      while (l <= math.min(maxPiece, i)) {
        lp.get(w.substring(i - l, i)).foreach { v =>
          if (b(i - l) + v == bi && np(i - l) + 1 < ni) ni = np(i - l) + 1
        }
        l += 1
      }
      b(i) = bi; np(i) = ni
      i += 1
    }
    // backward: longest piece consistent with the (score, pieces) optimum
    val pieces = scala.collection.mutable.ListBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      var chosen = -1
      var l = math.min(maxPiece, pos)
      while (l >= 1 && chosen < 0) {
        lp.get(w.substring(pos - l, pos)).foreach { v =>
          if (b(pos - l) + v == b(pos) && np(pos - l) + 1 == np(pos))
            chosen = l
        }
        l -= 1
      }
      require(chosen > 0, s"unreachable position $pos in '$w' — vocabulary lost a single char")
      pieces.prepend(w.substring(pos - chosen, pos))
      pos -= chosen
    }
    (np(n), b(n), pieces.mkString("|"))
  }

  /** Column handle. */
  def apply(word: Column, lp: Map[String, Long], maxPiece: Int): Column =
    ExpressionUtils.column(
      UnigramSegment(ExpressionUtils.expression(word), lp, maxPiece))
}
