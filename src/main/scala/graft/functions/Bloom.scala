package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.graft.shims

/** Column bindings for Spark's NATIVE bloom-filter expressions (the same
  * `BloomFilterAggregate` / `BloomFilterMightContain` pair Spark's own
  * runtime row-level filtering injects) — no UDF, no serialization per
  * row; the probe is a handful of hash ops against a broadcast bitset.
  *
  * Spark registers these internal-only (they back InjectRuntimeFilter),
  * so the public surface goes through the shim like the other native
  * expressions in this package.
  */
object Bloom {

  /** Aggregate a LongType column into a bloom-filter sketch (binary).
    * `items` sizes the filter (expected distinct items), `bits` caps it.
    */
  def bloomAgg(c: Column, items: Long, bits: Long): Column =
    shims.column(new BloomFilterAggregate(shims.expression(c),
      Literal(items), Literal(bits)).toAggregateExpression())

  /** Membership probe: false → definitely absent; true → maybe present
    * (bounded false-positive rate, zero false negatives). `might_contain`
    * requires its sketch side to be a constant or scalar subquery (it is
    * broadcast into the generated code), so the probe takes the WHOLE
    * single-row aggregate frame and wires it in as a scalar subquery —
    * the exact plan Spark's InjectRuntimeFilter builds.
    */
  def mightContain(bloomAggFrame: org.apache.spark.sql.DataFrame,
      v: Column): Column =
    shims.column(BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        shims.logicalPlan(bloomAggFrame)),
      shims.expression(v)))
}
