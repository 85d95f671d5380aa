package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class KnBigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  /** model counts recomputed independently: (c12 map, c1/nf per w1,
    * nb per w2, B) over the 80% slice. */
  private def model(dir: String) = {
    val docs = graft.core.Tables(spark, dir, "documents")
    val cut = Incremental.cutoffValue(docs)
    val bg = docs.filter(col("doc_id") <= cut)
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(t) - 1),
           i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"""))
        .as("g"))
      .select(col("g.w1"), col("g.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
    val c12 = bg.map(r => (r._1, r._2) -> r._3).toMap
    val c1 = bg.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nf = bg.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nb = bg.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    (c12, c1, nf, nb, bg.length.toLong)
  }

  test("KN is a true distribution: numerators sum to the denominator per history") {
    for (dir <- dirs) {
      val (c12, c1, nf, nb, b) = model(dir)
      val vocabW2 = nb.keySet
      c1.keys.foreach { w1 =>
        // Σ_w2 [max(4·c12−3,0)·B + 3·Nf·Nb(w2)] over the FULL continuation
        // vocabulary must equal 4·c1·B exactly (mass conservation)
        val numSum = vocabW2.toSeq.map { w2 =>
          math.max(4 * c12.getOrElse((w1, w2), 0L) - 3, 0L) * b +
            3 * nf(w1) * nb(w2)
        }.sum
        assert(numSum == 4 * c1(w1) * b,
          s"$dir: mass leak for history '$w1'")
      }
      info(s"$dir: exact unit mass over ${c1.size} histories " +
        s"(B=$b bigram types)")
    }
  }

  test("graded rows match the independent model and cover seen and unseen pairs") {
    for (dir <- dirs) {
      val (c12, c1, nf, nb, b) = model(dir)
      val out = LangModel.xKnBigram.build(spark, dir)
        .as[(String, String, Long, Long, Long, Long, Long)].collect()
      assert(out.nonEmpty)
      out.foreach { case (w1, w2, oc12, oc1, onf, onb, fix) =>
        assert(oc12 == c12.getOrElse((w1, w2), 0L))
        assert(oc1 == c1(w1) && onf == nf(w1))
        assert(onb == nb.getOrElse(w2, 0L))
        val num = math.max(4 * oc12 - 3, 0L) * b + 3 * onf * onb
        assert(fix == 1000000L * num / (4 * oc1 * b))
      }
      val unseen = out.count(_._3 == 0)
      assert(unseen > 0, s"$dir: no unseen eval bigram — backoff untested")
      assert(out.exists(_._3 > 0), s"$dir: no seen eval bigram")
      // the continuation term keeps every scored probability nonzero
      // whenever the continuation word exists in the model
      out.filter(_._6 > 0).foreach { r =>
        assert(r._7 > 0, s"$dir: zero P for in-vocab continuation $r")
      }
      info(s"$dir: ${out.length} eval bigram types, $unseen unseen " +
        "(smoothed through the continuation term)")
    }
  }
}
