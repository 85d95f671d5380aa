package graft.llmops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class QualityModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("featurize computes token stats and a deterministic label") {
    val df = Seq(
      (0L, "a a a a a a a a", 15L),          // 8 toks, uniq_ratio 0.125
      (1L, "the quick brown fox jumps", 25L) // 5 toks, uniq_ratio 1.0
    ).toDF("doc_id", "text", "n_chars")
    val f = QualityModel.featurize(df)
      .select("doc_id", "n_tok", "uniq_ratio", "stop_ratio", "label")
      .as[(Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val (nTok0, uniq0, stop0, label0) = f(0L)
    assert(nTok0 == 8.0 && uniq0 == 0.125 && stop0 == 1.0)
    // approx-median of {5, 8} is the data point 5 → doc 0 (8 toks) is
    // above it, doc 1 (5 toks) is not
    assert(label0 == 1.0)
    assert(f(1L)._4 == 0.0)
  }

  test("trainer separates a constructed-separable corpus with high accuracy") {
    val (n, acc) = QualityModel.trainAccuracy(
      graft.core.Tables(spark, "/root/testdata/sf0.001", "documents"))
    assert(n > 0)
    assert(acc >= 0.9, s"train accuracy $acc below the 0.9 gate")
  }

  test("contract query emits one row with acc_ok=true") {
    val out = QualityModel.xQualityClassifier
      .build(spark, "/root/testdata/sf0.001")
      .as[(Long, Boolean)].collect()
    assert(out.length == 1 && out.head._2)
  }
}
