package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class KmvQuantizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("kmv: estimator path is exercised and errors are within sketch bounds") {
    for (dir <- dirs) {
      val Array(r) = Kmv.xKmvDistinct.build(spark, dir)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      val (k, estA, estB, estU, estI, exactI) = r
      assert(k == Kmv.K)
      // recompute the exact cardinalities the estimates target
      val docs = graft.core.Tables(spark, dir, "documents")
      val sh = docs
        .select((col("doc_id") % 2 === 0).as("even"),
          split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("even"), explode(expr(
          """transform(sequence(1, size(t) - 2),
             i -> concat(element_at(t, i), ' ', element_at(t, i + 1),
                         ' ', element_at(t, i + 2)))""")).as("g"))
        .distinct()
      val exactA = sh.filter(col("even")).select("g").distinct().count()
      val exactB = sh.filter(!col("even")).select("g").distinct().count()
      val exactU = sh.select("g").distinct().count()
      assert(exactA > Kmv.K && exactB > Kmv.K,
        s"$dir: sets must exceed K so the estimator path runs")
      def relErr(est: Long, exact: Long) =
        math.abs(est - exact).toDouble / exact
      // KMV standard error ~ 1/sqrt(K-2) ≈ 6.3%; gate at 3σ
      assert(relErr(estA, exactA) < 0.19, s"$dir est_a=$estA exact=$exactA")
      assert(relErr(estB, exactB) < 0.19, s"$dir est_b=$estB exact=$exactB")
      assert(relErr(estU, exactU) < 0.19, s"$dir est_u=$estU exact=$exactU")
      // intersection inherits union noise times the inclusion fraction
      assert(relErr(estI, exactI) < 0.30, s"$dir est_i=$estI exact=$exactI")
      info(f"$dir: A ${relErr(estA, exactA)}%.3f B ${relErr(estB, exactB)}%.3f " +
        f"U ${relErr(estU, exactU)}%.3f I ${relErr(estI, exactI)}%.3f rel err " +
        f"(exact I=$exactI est I=$estI)")
    }
  }

  test("sq8: recall gate holds and quantization is genuinely lossy") {
    for (dir <- dirs) {
      val out = Quantize.xSq8Search.build(spark, dir)
        .as[(Long, Boolean)].collect()
      assert(out.length == 5)
      assert(out.forall(_._2), s"$dir: recall gate failed: ${out.toSeq}")
      // codes saturate the int8 range at the per-dim max, never exceed it
      val q = Quantize.codes(spark, dir)
        .select(explode(col("q")).as("c")).agg(max(abs(col("c"))))
        .as[Int].collect().head
      assert(q == 127, s"$dir: max |code| $q — scaling is off")
      // lossiness: the integer-dot order must differ from the exact order
      // for at least one probe (otherwise the recall gate tests nothing)
      val c = Quantize.codes(spark, dir)
      val probes = c.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"),
          col("n_emb").as("p_emb"), col("q").as("pq"))
      val scored = c.crossJoin(broadcast(probes))
        .select(col("probe_id"), col("vec_id"),
          expr("""aggregate(zip_with(q, pq, (a, b) -> cast(a as bigint) * b),
                  0L, (acc, v) -> acc + v)""").as("iscore"),
          round(VectorSearch.dot(col("n_emb"), col("p_emb")) *
            Quantize.SIM_SCALE).cast("long").as("fsim"))
      val disagree = scored
        .groupBy("probe_id")
        .agg(graft.functions.TopKByScore.topK(Quantize.CAND)(
          col("iscore"), col("vec_id")).as("ti"),
          graft.functions.TopKByScore.topK(Quantize.CAND)(
            col("fsim"), col("vec_id")).as("tf"))
        .select((col("ti.id") =!= col("tf.id")).as("d"))
        .as[Boolean].collect()
      assert(disagree.exists(identity),
        s"$dir: SQ order identical to exact order for all probes")
      info(s"$dir: recall_ok 5/5, ${disagree.count(identity)}/5 probes " +
        "with SQ-vs-exact order divergence")
    }
  }
}
