package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.{shims => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row WordPiece greedy longest-match-first segmentation
  * (Wu et al. 2016's inference rule, the one BERT ships): at each
  * position try the longest vocabulary piece first and commit to the
  * first hit — word-initial positions match pieces as-is, later
  * positions match `##`-marked continuation pieces. Returns
  * struct(n_pieces, seg) for one word.
  *
  * Same shape as [[UnigramSegment]] and for the same reason: the greedy
  * walk for one word is per-row scalar work, and an unrolled column
  * pipeline (one L/piece/pos column per step) pays Catalyst analysis
  * over ever-growing expression trees for microseconds of evaluation.
  * Unlike the unigram DP there is NO score arithmetic at all — matching
  * is pure set membership — so the cross-engine contract needs no
  * fixed-point discipline: both engines agree iff they hold the same
  * vocabulary set.
  *
  * Evaluation is interpreted (CodegenFallback) — the input is the word
  * HISTOGRAM (vocabulary-sized), never the corpus.
  */
case class WordPieceSegment(child: Expression, vocab: Set[String],
    maxPiece: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("seg", StringType, nullable = false)))

  override def nullSafeEval(a: Any): Any = {
    val w = a.asInstanceOf[UTF8String].toString
    val (np, seg) = WordPieceSegment.segment(w, vocab, maxPiece)
    InternalRow(np, UTF8String.fromString(seg))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceSegment {

  /** (n_pieces, seg) for one word — the reference greedy walk, also
    * called directly by the spec's independent re-derivation. Every
    * single character of the corpus is in the vocabulary in both its
    * word-initial and continuation form by construction, so the walk
    * always terminates with full coverage; a vocabulary that lost a
    * single char fails loudly here rather than emitting a short seg.
    */
  def segment(w: String, vocab: Set[String], maxPiece: Int)
      : (Long, String) = {
    val n = w.length
    val pieces = scala.collection.mutable.ListBuffer.empty[String]
    var pos = 0
    while (pos < n) {
      var chosen = -1
      var l = math.min(maxPiece, n - pos)
      while (l >= 1 && chosen < 0) {
        val cand =
          if (pos == 0) w.substring(0, l)
          else "##" + w.substring(pos, pos + l)
        if (vocab.contains(cand)) chosen = l
        l -= 1
      }
      require(chosen > 0,
        s"unmatchable position $pos in '$w' — vocabulary lost a single char")
      pieces += (if (pos == 0) w.substring(0, chosen)
                 else "##" + w.substring(pos, pos + chosen))
      pos += chosen
    }
    (pieces.length.toLong, pieces.mkString("|"))
  }

  /** Column handle. */
  def apply(word: Column, vocab: Set[String], maxPiece: Int): Column =
    ExpressionUtils.column(
      WordPieceSegment(ExpressionUtils.expression(word), vocab, maxPiece))
}
