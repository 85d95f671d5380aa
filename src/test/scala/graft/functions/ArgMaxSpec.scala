package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Round-14: the native two-long-buffer argmax (ArgMaxLongPair) — the
  * HashAggregate-eligible replacement for max(struct) argmaxes.
  */
class ArgMaxSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("argmax picks greatest ord; ties break by greatest payload") {
    val df = Seq(
      (1L, 10L, 100L), (1L, 20L, 50L), (1L, 20L, 60L), // tie at ord=20
      (2L, 5L, 1L)
    ).toDF("g", "ord", "p")
    val got = df.groupBy("g")
      .agg(ArgMax.argmaxLongPair(col("ord"), col("p")).as("best"))
      .select(col("g"), col("best.m"), col("best.nt"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 20L, 60L), (2L, 5L, 1L)))
  }

  test("negated-payload spelling = smallest-id tie rule (the SQL " +
      "row_number ORDER BY ord DESC, id ASC)") {
    val df = Seq((1L, 7L, 3L), (1L, 7L, 2L), (1L, 6L, 1L)).toDF("g", "ord", "id")
    val got = df.groupBy("g")
      .agg(ArgMax.argmaxLongPair(col("ord"), -col("id")).as("best"))
      .select(col("g"), col("best.m"), (-col("best.nt")).as("id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 7L, 2L)))
  }

  test("null ord rows are ignored; all-null group evaluates to null") {
    val df = Seq(
      (1L, Some(3L), Some(9L)), (1L, None, Some(8L)),
      (2L, None, None)
    ).toDF("g", "ord", "p")
    val rows = df.groupBy("g")
      .agg(ArgMax.argmaxLongPair(col("ord"), col("p")).as("best"))
      .orderBy("g").collect()
    assert(rows(0).getStruct(1).getLong(0) == 3L)
    assert(rows(0).getStruct(1).getLong(1) == 9L)
    assert(rows(1).isNullAt(1), "all-null group must evaluate to null")
  }

  test("plans into HashAggregate, never SortAggregate (the point)") {
    val df = Seq((1L, 2L, 3L)).toDF("g", "ord", "p")
    val plan = df.groupBy("g")
      .agg(ArgMax.argmaxLongPair(col("ord"), col("p")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
    // the struct spelling it replaces demonstrably DOES sort-aggregate —
    // guards against this test silently passing on a changed planner
    val structPlan = df.groupBy("g")
      .agg(max(struct(col("ord"), col("p"))))
      .queryExecution.executedPlan.toString
    assert(structPlan.contains("SortAggregate"), structPlan)
  }

  test("double variant: greatest ord, greatest payload on ties, NaN wins " +
      "(Spark comparison semantics, matching the max(struct) it replaces)") {
    val df = Seq(
      (1L, 0.5, 10L), (1L, 0.9, 20L), (1L, 0.9, 30L),
      (2L, Double.NaN, 1L), (2L, 99.0, 2L)
    ).toDF("g", "ord", "p")
    val got = df.groupBy("g")
      .agg(ArgMax.argmaxDoubleLong(col("ord"), col("p")).as("best"))
      .select(col("g"), col("best.m"), col("best.nt"))
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((0.9, 30L)))
    assert(got(2L)._1.isNaN && got(2L)._2 == 1L, "NaN > everything, as in struct ordering")
    // cross-check the tie/NaN rules against the struct spelling directly
    val ref = df.groupBy("g").agg(max(struct(col("ord"), col("p"))).as("b"))
      .select(col("g"), col("b.ord"), col("b.p"))
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(ref(1L) == ((got(1L)._1, got(1L)._2)))
    assert(ref(2L)._1.isNaN && ref(2L)._2 == got(2L)._2)
  }

  test("double variant plans into HashAggregate") {
    val df = Seq((1L, 2.0, 3L)).toDF("g", "ord", "p")
    val plan = df.groupBy("g")
      .agg(ArgMax.argmaxDoubleLong(col("ord"), col("p")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && !plan.contains("SortAggregate"), plan)
  }

  test("full value domain: the former empty-sentinel values are real " +
      "results (explicit seen-flag buffer, round-15 advice fix)") {
    // long variant: a group whose only row is (Long.MinValue, Long.MinValue)
    // must evaluate to that row, not be ignored / read as empty
    val lmin = Seq((1L, Long.MinValue, Long.MinValue)).toDF("g", "ord", "p")
    val r1 = lmin.groupBy("g")
      .agg(ArgMax.argmaxLongPair(col("ord"), col("p")).as("best")).collect()
    assert(!r1(0).isNullAt(1), "MinValue winner must not read as empty group")
    assert(r1(0).getStruct(1).getLong(0) == Long.MinValue)
    assert(r1(0).getStruct(1).getLong(1) == Long.MinValue)
    // MinValue ord rows also lose correctly to any real larger ord
    val mixL = Seq((1L, Long.MinValue, 9L), (1L, 0L, 3L)).toDF("g", "ord", "p")
    val r2 = mixL.groupBy("g")
      .agg(ArgMax.argmaxLongPair(col("ord"), col("p")).as("best"))
      .select(col("best.m"), col("best.nt")).as[(Long, Long)].collect()
    assert(r2.head == ((0L, 3L)))
    // double variant: the exact former sentinel pair (-Inf, MinValue)
    val dmin = Seq((1L, Double.NegativeInfinity, Long.MinValue))
      .toDF("g", "ord", "p")
    val r3 = dmin.groupBy("g")
      .agg(ArgMax.argmaxDoubleLong(col("ord"), col("p")).as("best")).collect()
    assert(!r3(0).isNullAt(1), "(-Inf, MinValue) winner must not read as empty")
    assert(r3(0).getStruct(1).getDouble(0).isNegInfinity)
    assert(r3(0).getStruct(1).getLong(1) == Long.MinValue)
    // and -Inf loses to any finite ord
    val mixD = Seq((1L, Double.NegativeInfinity, 9L), (1L, -1.0, 3L))
      .toDF("g", "ord", "p")
    val r4 = mixD.groupBy("g")
      .agg(ArgMax.argmaxDoubleLong(col("ord"), col("p")).as("best"))
      .select(col("best.m"), col("best.nt")).as[(Double, Long)].collect()
    assert(r4.head == ((-1.0, 3L)))
  }

  test("rejects non-long inputs with a named error") {
    val df = Seq((1L, "a", 2L)).toDF("g", "ord", "p")
    val e = intercept[Exception] {
      df.groupBy("g").agg(ArgMax.argmaxLongPair(col("ord"), col("p"))).collect()
    }
    assert(e.getMessage.contains("argmax_long_pair") ||
      e.getMessage.toLowerCase.contains("bigint"), e.getMessage)
  }
}
