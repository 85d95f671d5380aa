package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{shims => ExpressionUtils}
import org.apache.spark.sql.types._

/** Native per-row MMR greedy selection: given one probe's candidate
  * pool [(vec_id, rel_fix)] and its within-pool pairwise similarities
  * [(a, b, sim_fix)], run the full λ-weighted greedy trajectory and
  * return [(step, vec_id, score_fix)].
  *
  * The UnigramSegment lesson applied to a SELECTION loop: the greedy
  * state for one probe is k-bounded scalar work, and the first spelling
  * — one anti-join + join + aggregate + window PER STEP over
  * dozens-of-row frames — paid ~16 shuffle stages of pure scheduling
  * overhead (measured 4.4 s at sf0.1 against sub-millisecond actual
  * arithmetic). As a per-row expression the whole trajectory costs one
  * aggregation to build the per-probe arrays plus one projection, and
  * the operator scales to millions of probes by partitioning on
  * probe_id.
  *
  * Semantics must stay bit-identical to the DuckDB layered-CTE oracle:
  * all-integer scores (WREL·rel − WDIV·maxsim), ties broken to the
  * smaller vec_id, step 1 = pure relevance.
  *
  * Evaluation is interpreted (CodegenFallback) — one row per probe.
  */
case class MmrSelect(left: Expression, right: Expression,
    selk: Int, wrel: Long, wdiv: Long)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("step", LongType, nullable = false),
    StructField("vec_id", LongType, nullable = false),
    StructField("score_fix", LongType, nullable = false))), false)

  override def nullSafeEval(poolAny: Any, simAny: Any): Any = {
    val poolArr = poolAny.asInstanceOf[ArrayData]
    val simArr = simAny.asInstanceOf[ArrayData]
    val pool = (0 until poolArr.numElements()).map { i =>
      val r = poolArr.getStruct(i, 2)
      (r.getLong(0), r.getLong(1))
    }
    val sims = (0 until simArr.numElements()).map { i =>
      val r = simArr.getStruct(i, 3)
      (r.getLong(0), r.getLong(1)) -> r.getLong(2)
    }.toMap
    val out = MmrSelect.trajectory(pool, sims, selk, wrel, wdiv)
    new GenericArrayData(out.zipWithIndex.map { case ((v, sc), i) =>
      InternalRow((i + 1).toLong, v, sc)
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MmrSelect {

  /** The reference greedy walk — also called by MmrSpec directly. */
  def trajectory(pool: Seq[(Long, Long)], sims: Map[(Long, Long), Long],
      selk: Int, wrel: Long, wdiv: Long): Seq[(Long, Long)] = {
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val first = pool.maxBy { case (v, rel) => (rel, -v) }
    sel += ((first._1, first._2 * wrel))
    while (sel.length < math.min(selk, pool.length)) {
      val rest = pool.filterNot(c => sel.exists(_._1 == c._1))
      val scored = rest.map { case (v, rel) =>
        val msim = sel.map(s => sims((v, s._1))).max
        (v, rel * wrel - msim * wdiv)
      }
      sel += scored.maxBy { case (v, sc) => (sc, -v) }
    }
    sel.toSeq
  }

  /** Column handle: pool = array<struct<vec_id, rel_fix>>,
    * sims = array<struct<a, b, sim_fix>>.
    */
  def apply(pool: Column, sims: Column, selk: Int, wrel: Long,
      wdiv: Long): Column =
    ExpressionUtils.column(MmrSelect(
      ExpressionUtils.expression(pool),
      ExpressionUtils.expression(sims), selk, wrel, wdiv))
}
