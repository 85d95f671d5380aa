package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Round-8 additions beyond the per-operator specs: the token-budget
  * subsampler's bucket decomposition against a driver-side brute force.
  */
class Round8Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("PQ: codes well-formed, ADC recall clears the bar at sf0.001 and sf0.01") {
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val e = graft.llmops.VectorSearch.embeddingsBase(spark, dir)
        .select("vec_id", "n_emb")
      val cb = graft.llmops.VectorSearch.pqCodebooks(e, graft.llmops.VectorSearch.PQ_ITERS)
      // full codebooks: every (block, cid) slot present, correct width
      val cbRows = cb.as[(Int, Int, Seq[Double], Double)].collect()
      assert(cbRows.length ==
        graft.llmops.VectorSearch.PQ_BLOCKS * graft.llmops.VectorSearch.PQ_K)
      val dim = e.select(size(col("n_emb"))).as[Int].head()
      assert(cbRows.forall(_._3.length == dim / graft.llmops.VectorSearch.PQ_BLOCKS))
      // every vector gets exactly PQ_BLOCKS codes in [0, PQ_K)
      val codes = graft.llmops.VectorSearch.assignCodes(
        graft.llmops.VectorSearch.subvectors(e), cb)
        .as[(Long, Int, Int)].collect()
      val n = e.count()
      assert(codes.length == n * graft.llmops.VectorSearch.PQ_BLOCKS)
      assert(codes.forall(c => c._3 >= 0 && c._3 < graft.llmops.VectorSearch.PQ_K))
      // recall facts: printed for bar calibration, asserted >= bar
      val rec = graft.llmops.VectorSearch.pqRecall(spark, dir)
        .as[(Long, Double, Boolean)].collect()
      info(s"$dir PQ recalls: ${rec.map(r => s"${r._1}:${r._2}").mkString(" ")}")
      assert(rec.length == 5)
      assert(rec.forall(_._3),
        s"$dir: probes below bar: ${rec.filterNot(_._3).mkString(",")}")
    }
  }

  test("token budget: bucket-refined selection equals the naive greedy prefix") {
    val got = graft.llmops.Chunking.xTokenBudget.build(spark, sf)
      .as[(Long, String, Long, Long)].collect()
    assert(got.nonEmpty)

    // driver-side brute force of the contract (naive single-pass form)
    val docs = graft.core.Tables(spark, sf, "documents")
      .selectExpr("doc_id", "lang",
        "CAST(size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS LONG)")
      .as[(Long, String, Long)].collect()
    val btot = docs.map(_._3).sum / graft.llmops.Chunking.BUDGET_DEN
    val langs = docs.map(_._2).distinct.sorted
    val budget = langs.zipWithIndex.map { case (l, i) =>
      l -> (btot / langs.length + (if (i < btot % langs.length) 1L else 0L))
    }.toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      var cum = 0L
      ds.sortBy(d => (md5hex(d._1.toString), d._1)).flatMap { case (id, _, n) =>
        cum += n
        if (cum <= budget(lang)) Some((id, lang, n, cum)) else None
      }
    }.sortBy(_._1)
    assert(got.toSeq == expect,
      s"bucket decomposition diverged: got ${got.length} rows, expected ${expect.length}")

    // greedy maximality: per language, selected tokens fit the budget and
    // the selection is the longest md5-order prefix that does
    got.groupBy(_._2).foreach { case (lang, rows) =>
      assert(rows.map(_._3).sum <= budget(lang))
      assert(rows.map(_._4).max == rows.map(_._3).sum,
        "cum_tokens of the last selected doc must equal the selected sum")
    }
    // global: we asked for ~a fifth of the corpus; the shortfall is at
    // most one doc per language (the boundary doc that didn't fit)
    val selected = got.map(_._3).sum
    assert(selected <= btot)
  }
}
