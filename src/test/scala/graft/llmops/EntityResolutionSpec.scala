package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class EntityResolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("recovers the planted entities exactly at every SF") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val out = EntityResolution.xEntityResolution.build(spark, dir)
        .as[(Long, Long, Long, Boolean)].collect()
      val maxK = out.map(_._1).max
      out.foreach { case (k, entity, nMembers, canon) =>
        // ground truth: entity = the smallest key of k's planted group
        assert(entity == (k / 3) * 3, s"$dir: record $k resolved to $entity")
        // full groups have all 3 members; the tail group may be short
        val expectSize = math.min(maxK - (k / 3) * 3 + 1, 3L)
        assert(nMembers == expectSize, s"$dir: record $k group size $nMembers")
        assert(canon == (k % 3 == 0), s"$dir: record $k canonical flag")
      }
      // precision AND recall are exact: no merged entities (every group
      // ≤ 3) and no split entities (every group has its full size) —
      // both already asserted per record above; count entities
      val nEnt = out.map(_._2).distinct.length
      assert(nEnt == (maxK / 3 + 1), s"$dir: $nEnt entities")
      info(s"$dir: ${out.length} records -> $nEnt entities, exact recovery")
    }
  }

  test("d<=2 deletion neighborhood: exact variant set on a known word") {
    import org.apache.spark.sql.functions.{expr, col}
    val got = Seq("abc").toDF("w")
      .select(expr(EntityResolution.delNbrSql("w")).as("nb"))
      .as[Seq[String]].head().toSet
    // itself, three 1-deletions, three 2-deletions (C(3,2) pairs)
    assert(got == Set("abc", "bc", "ac", "ab", "c", "b", "a"))
    // degenerate lengths must not trip Spark's descending sequence()
    val one = Seq("x").toDF("w")
      .select(expr(EntityResolution.delNbrSql("w")).as("nb"))
      .as[Seq[String]].head().toSet
    assert(one == Set("x", ""))
  }

  test("fuzzyPairs2 equals brute force (deletion cover re-proven) and " +
    "catches the planted 2-edit pairs") {
    import org.apache.spark.sql.functions.{col, levenshtein}
    val v = EntityResolution.dirtyVocab(
      graft.core.Tables(spark, "/root/testdata/sf0.001", "customer"))
      .cache()
    val blocked = EntityResolution.fuzzyPairs2(v)
      .as[(String, String, Long)].collect().toSet
    val brute = v.select(col("w").as("a"))
      .join(v.select(col("w").as("b")), col("a") < col("b"))
      .withColumn("d", levenshtein(col("a"), col("b")).cast("long"))
      .filter(col("d") <= 2)
      .as[(String, String, Long)].collect().toSet
    assert(blocked == brute, "blocking lost or invented a pair")
    // the planted 2-edit family: each entity's first-char corruption vs
    // its last-char deletion is exactly 2 edits (substitute + delete) —
    // unreachable at d<=1, present at d<=2
    val d2 = blocked.filter(_._3 == 2L)
    assert(d2.nonEmpty, "no d=2 pairs found")
    val d1 = blocked.filter(_._3 <= 1L)
    val d1Set = EntityResolution.fuzzyPairs(v)
      .as[(String, String)].collect().toSet
    assert(d1.map(t => (t._1, t._2)) == d1Set,
      "d<=1 slice of the d<=2 join must equal the d<=1 join")
    v.unpersist()
    ()
  }

  test("match-pair separation: planted pairs above threshold, cross pairs below") {
    val dir = "/root/testdata/sf0.01"
    val recs = EntityResolution.records(spark, dir)
    val pairs = EntityResolution.matchPairs(recs)
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    // every surviving match is a planted pair (precision 1 by measurement)
    pairs.foreach { case (a, b, sim) =>
      assert(a / 3 == b / 3, s"false match ($a, $b) at sim $sim")
      assert(sim >= EntityResolution.JW_TH)
    }
    // and every planted pair survives (recall 1): 3-member groups
    // contribute 3 pairs each (all within one first-char block)
    val nFull = recs.count() / 3
    assert(pairs.length >= 2 * nFull, s"only ${pairs.length} matches")
  }
}
