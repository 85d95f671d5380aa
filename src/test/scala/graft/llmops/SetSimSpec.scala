package graft.llmops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SetSimSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Driver-side brute force over word-3-gram shingle STRING sets —
    * every pair, exact intersection; the completeness yardstick the
    * prefix filter must equal exactly (hash collisions aside, which
    * would also fail the oracle gate).
    */
  private def reference(docs: Seq[(Long, String)], num: Int, den: Int)
      : Set[(Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, t) =>
      val w = t.split(" ", -1)
      id -> w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toLong
      uni = sa.size + sb.size - inter
      if den * inter >= num.toLong * uni
    } yield (a, b, inter, uni)).toSet
  }

  test("prefix-filtered join equals brute force on the sf0.001 corpus") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val got = SetSim.xSetSimJoin.build(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.sortBy(r => (r._1, r._2)).toSeq == got.toSeq) // ordered output
    assert(got.toSet == reference(docs, SetSim.T_NUM, SetSim.T_DEN))
    assert(got.nonEmpty) // the corpus has near-dup families; none found = broken
  }

  /** Brute-force containment reference: ordered pairs, |A∩B|/|A| ≥ num/den. */
  private def referenceContain(docs: Seq[(Long, String)], num: Int, den: Int)
      : Set[(Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, t) =>
      val w = t.split(" ", -1)
      id -> w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      inter = (sa & sb).size.toLong
      if den * inter >= num.toLong * sa.size
    } yield (a, b, inter, sa.size.toLong)).toSet
  }

  test("containment join equals brute force on the sf0.001 corpus") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val got = SetSim.xContainmentJoin.build(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSet == referenceContain(docs, SetSim.C_NUM, SetSim.C_DEN))
    assert(got.nonEmpty)
  }

  test("containment catches a short doc inside a long one that Jaccard misses") {
    // doc 1's 3 shingles all appear in doc 2 (containment 1.0), but doc 2
    // has many more shingles, so Jaccard is far below 3/5
    val docs = Seq(
      1L -> "a b c d e",
      2L -> "a b c d e f g h i j k l m n o p q r s t",
      3L -> "z y x w v u")
    val sets = MinHashLSH.wordSets(docs.toDF("doc_id", "text"), 3)
    val contain = SetSim.containedPairs(sets, SetSim.C_NUM, SetSim.C_DEN)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(contain == referenceContain(docs, SetSim.C_NUM, SetSim.C_DEN))
    assert(contain.contains((1L, 2L, 3L, 3L)))     // fully contained
    assert(!contain.exists(p => p._1 == 2L))       // not the other direction
    val sim = SetSim.similarPairs(sets, SetSim.T_NUM, SetSim.T_DEN)
      .as[(Long, Long, Long, Long)].collect()
    assert(!sim.exists(p => p._1 == 1L && p._2 == 2L)) // Jaccard misses it
  }

  test("prefix filter is complete on adversarial small sets") {
    // 3-word docs (single shingle, prefix length 1), identical docs
    // (J = 1), a pair exactly at the threshold (inter 3, union 5 via
    // 4-shingle docs sharing 3), and a pair just below it
    val docs = Seq(
      1L -> "a b c", 2L -> "a b c",              // identical single shingle
      3L -> "w x y z q", 4L -> "w x y z r",      // shingles {wxy,xyz,yzq} vs {wxy,xyz,yzr}: J=2/4 < 3/5
      5L -> "m n o p q r", 6L -> "m n o p q s",  // {mno,nop,opq,pqr} vs {mno,nop,opq,pqs}: inter 3, uni 5 = 3/5
      7L -> "lone doc here three words")
    val sets = MinHashLSH.wordSets(docs.toDF("doc_id", "text"), 3)
    val got = SetSim.similarPairs(sets, SetSim.T_NUM, SetSim.T_DEN)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == reference(docs, SetSim.T_NUM, SetSim.T_DEN))
    assert(got.contains((1L, 2L, 1L, 1L)) && got.contains((5L, 6L, 3L, 5L)))
    assert(!got.exists(r => r._1 == 3L && r._2 == 4L))
  }
}
