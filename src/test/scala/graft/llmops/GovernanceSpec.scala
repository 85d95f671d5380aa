package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class GovernanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("k-anonymity: groups partition the corpus and flags match sizes") {
    for (dir <- dirs) {
      val out = Governance.xKAnonymity.build(spark, dir)
        .as[(String, String, Long, Long, Boolean, Boolean)].collect()
      val total = graft.core.Tables(spark, dir, "documents").count()
      assert(out.map(_._4).sum == total, s"$dir: group sizes must sum to N")
      out.foreach { case (lang, source, b, n, k5, k20) =>
        assert(n >= 1)
        assert(k5 == (n >= 5) && k20 == (n >= 20),
          s"$dir: flag mismatch for ($lang,$source,$b) n=$n")
      }
      // the audit is only interesting if violations exist at this SF
      assert(out.exists(!_._5), s"$dir: expected at least one k<5 group")
      info(s"$dir: ${out.length} QI groups, " +
        s"${out.count(!_._5)} below k=5, ${out.count(!_._6)} below k=20")
    }
  }

  test("kappa: integer rational equals the textbook double formula") {
    for (dir <- dirs) {
      val Array(r) = Governance.xKappaAgreement.build(spark, dir)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      val (n11, n10, n01, n00, n, num, den, fix) = r
      assert(n11 + n10 + n01 + n00 == n)
      val po = (n11 + n00).toDouble / n
      val pe = ((n11 + n10) * (n11 + n01) +
        (n01 + n00) * (n10 + n00)).toDouble / (n.toDouble * n)
      val kappa = (po - pe) / (1 - pe)
      assert(den > 0, "degenerate marginals would zero the denominator")
      assert(math.abs(num.toDouble / den - kappa) < 1e-12)
      // truncation-toward-zero fixed point, sign-split spelling
      val expFix =
        if (num < 0) -((1000000L * -num) / den) else (1000000L * num) / den
      assert(fix == expFix)
      // meaningful agreement: annotators correlate but are not identical
      assert(fix > 100000 && fix < 999999,
        s"$dir: kappa_fix=$fix degenerate — retune annotator rules")
      info(s"$dir: kappa=${fix / 1e6} cells=($n11,$n10,$n01,$n00)")
    }
  }

  test("ece: per-bin gaps are exact and the total matches brute force") {
    for (dir <- dirs) {
      val out = Governance.xEceCalibration.build(spark, dir)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      val total = graft.core.Tables(spark, dir, "documents").count()
      assert(out.map(_._2).sum == total)
      val eceFix = out.map(_._6).distinct
      assert(eceFix.length == 1, "ece_fix must be a single global constant")
      out.foreach { case (_, n, pos, confSum, gap, _) =>
        assert(pos >= 0 && pos <= n)
        assert(gap == math.abs(1000 * pos - confSum))
      }
      val expected = 1000000L * out.map(_._5).sum / (1000L * total)
      assert(eceFix.head == expected)
      // calibration error is nonzero (the proxy predictor is imperfect)
      assert(eceFix.head > 0, s"$dir: ECE=0 means the audit tests nothing")
      info(s"$dir: ECE=${eceFix.head / 1e6} over ${out.length} bins")
    }
  }

  test("sign-split fixed point matches truncation on negative rationals") {
    // both engines truncate integer division toward zero; the sign-split
    // spelling makes that explicit — pin it against literal negatives
    val rows = Seq((-7L, 2L), (7L, 2L), (-1L, 3L), (0L, 5L))
      .toDF("num", "den")
      .select(col("num"), col("den"),
        when(col("num") < 0, -expr("(1000000 * -num) div den"))
          .otherwise(expr("(1000000 * num) div den")).as("fix"))
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, c) => ((a, b), c) }.toMap
    assert(rows((-7L, 2L)) == -3500000L)
    assert(rows((7L, 2L)) == 3500000L)
    assert(rows((-1L, 3L)) == -333333L)
    assert(rows((0L, 5L)) == 0L)
  }
}
