package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at scale.
  *
  * AQE's skew-join splitting (on by default) covers sort-merge joins; these
  * helpers cover the remaining cases — skewed AGGREGATION keys, and
  * broadcast-ineligible skewed joins — with classic salting: explode the
  * hot side's key space by a salt, do the heavy operation on (key, salt)
  * groups, then reduce the salt away.
  */
object Skew {

  /** Two-phase aggregation for skewed group keys: count/sum-style partial
    * aggregates are computed per (key, salt) — spreading each hot key over
    * `salts` reducers — then combined per key. The caller passes
    * (sum-ready) aggregate columns and their combiners keyed by name.
    */
  def saltedAggregate(
      df: DataFrame,
      key: Column,
      salts: Int,
      partials: Seq[Column],
      combine: Seq[Column]): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("_key"), col("_salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("_key"))
      .agg(combine.head, combine.tail: _*)

  /** Salted equi-join of a skewed LEFT side against a small-ish RIGHT side
    * that cannot be broadcast: the right side is replicated `salts` times
    * (one copy per salt value), the left side gets a random-ish salt, and
    * the join key becomes (key, salt) — each hot key now spreads over
    * `salts` tasks. Replication factor × right-side size is the cost; use
    * broadcast() instead whenever the right side fits.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      salts: Int): DataFrame = {
    val saltedLeft = left.withColumn(
      "_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val saltedRight = right.withColumn(
      "_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight,
      saltedLeft(leftKey) === saltedRight(rightKey)
        && saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }
}
