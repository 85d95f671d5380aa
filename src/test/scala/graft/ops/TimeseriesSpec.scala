package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class TimeseriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("interpolate fills every interior gap and preserves non-null values") {
    val out = Timeseries.xInterpolate.build(spark, sf)
      .select("o_orderpriority", "o_orderkey", "price", "was_gap")
      .as[(String, Long, Option[Double], Boolean)].collect()
    val orig = graft.core.Tables(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice").as[(Long, Double)].collect().toMap
    assert(out.nonEmpty)
    // non-gap rows carry the original price exactly
    out.filter(!_._4).foreach { case (_, k, p, _) =>
      assert(p.contains(orig(k)), s"key $k changed a non-null value")
    }
    // gap rows: filled, and between the series' min/max (linear interp
    // of interior points can't extrapolate)
    val filled = out.filter(_._4)
    assert(filled.nonEmpty)
    assert(filled.forall(_._3.nonEmpty), "a gap row stayed null")
    val lo = orig.values.min
    val hi = orig.values.max
    filled.foreach { case (_, _, Some(p), _) =>
      assert(p >= lo - 1e-9 && p <= hi + 1e-9)
    }
  }

  test("interpolate is exact on a hand-built series") {
    // series: k=1 -> 10.0, k=2 -> null, k=4 -> null, k=7 -> 40.0
    // interp at k=2: 10 + 30 * (1/6) = 15.0; at k=4: 10 + 30 * (3/6) = 25.0
    val df = Seq(("a", 1L, Some(10.0)), ("a", 2L, None),
      ("a", 4L, None), ("a", 7L, Some(40.0)),
      ("b", 1L, None), ("b", 2L, Some(5.0)), ("b", 3L, None))
      .toDF("p", "k", "v")
    val got = Timeseries.interpolateLinear(df, "p", "k", "v")
      .orderBy("p", "k").as[(String, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("a", 1L, Some(10.0)), ("a", 2L, Some(15.0)),
      ("a", 4L, Some(25.0)), ("a", 7L, Some(40.0)),
      ("b", 1L, Some(5.0)), // head backfill
      ("b", 2L, Some(5.0)), ("b", 3L, Some(5.0)))) // tail forward-fill
  }

  test("rolling median picks the exact middle element of each 7-row frame") {
    val rows = Timeseries.xRollingMedian.build(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // independent recompute on the driver for a handful of users
    val ev = graft.core.Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("CAST(round(value*100) AS BIGINT)").as("c"))
      .as[(Long, Long, java.sql.Timestamp, Long)].collect()
      .groupBy(_._1)
    val got = rows.groupBy(_._1)
    ev.view.take(5).foreach { case (u, es) =>
      // full-precision order: getTime is millis-truncated, getNanos
      // carries the sub-second part the window actually sorts on
      val ordered = es.sortBy(e => (e._3.getTime / 1000, e._3.getNanos, e._2)).map(_._4)
      val expect = ordered.indices.map { i =>
        val frame = ordered.slice(math.max(0, i - 6), i + 1).sorted
        frame((frame.length + 1) / 2 - 1)
      }
      val mine = got(u).sortBy(_._2).map(_._3).toSeq
      assert(mine == expect, s"user $u rolling medians diverge")
    }
  }

  test("gap detection island counts are self-consistent") {
    val rows = Timeseries.xGapDetect.build(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, nMissing, nGaps, maxGap) =>
      assert(nGaps >= 1 && maxGap >= 1, s"user $u has degenerate gaps")
      assert(maxGap <= nMissing, s"user $u max_gap > n_missing")
      assert(nMissing >= nGaps, s"user $u more gaps than missing hours")
    }
    // cross-check one user's n_missing against a direct count
    val (u, nMissing, _, _) = rows.head
    val hours = graft.core.Tables(spark, sf, "events")
      .filter(col("user_id") === u)
      .select(date_trunc("hour", col("ts")).as("h")).distinct()
      .as[java.sql.Timestamp].collect().map(_.getTime / 3600000L).sorted
    val expected = (hours.last - hours.head + 1) - hours.length
    assert(nMissing == expected, s"user $u n_missing $nMissing != $expected")
  }

  test("cumulative distinct users is monotone and ends at the true total") {
    val rows = Timeseries.xWindowDistinct.build(spark, sf)
      .select("dau", "cum_users").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    rows.foreach { case (dau, cum) => assert(dau <= cum) }
    val total = graft.core.Tables(spark, sf, "events")
      .select(countDistinct(col("user_id"))).as[Long].head()
    assert(rows.last._2 == total)
  }

  test("mode/median: mode is the max-count value with smallest-value ties") {
    val rows = Extra.xModeMedian.build(spark, sf)
      .as[(String, Double, Long, Double)].collect()
    assert(rows.length == 3) // A, N, R
    val li = graft.core.Tables(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity").as[(String, Double)].collect()
    rows.foreach { case (flag, modeQty, modeN, medianQty) =>
      val counts = li.filter(_._1 == flag).groupBy(_._2).view.mapValues(_.length)
      val best = counts.toSeq.sortBy { case (q, c) => (-c, q) }.head
      assert((modeQty, modeN) == (best._1, best._2.toLong), s"flag $flag mode")
      val sorted = li.filter(_._1 == flag).map(_._2).sorted
      val n = sorted.length
      val med = if (n % 2 == 1) sorted(n / 2)
        else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
      assert(medianQty == med, s"flag $flag median")
    }
  }

  test("schema evolution: merged read nulls the missing column for batch 1") {
    val rows = Extra.xSchemaEvolution.build(spark, sf)
      .as[(Option[String], Long, Double)].collect()
    val orders = graft.core.Tables(spark, sf, "orders")
    val b1 = orders.filter(col("o_orderkey") % 3 === 0).count()
    val b2 = orders.filter(col("o_orderkey") % 3 === 1).count()
    assert(rows.filter(_._1.isEmpty).map(_._2).sum == b1)
    assert(rows.filter(_._1.nonEmpty).map(_._2).sum == b2)
    assert(rows.count(_._1.isEmpty) == 1)
  }

  test("word entropy: uniform docs score log2(n), repeated docs score 0") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "x x x x"), (3L, "a a b b"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("__ent_docs")
    // reuse the library shape directly against a tiny frame
    val counts = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val withN = counts.withColumn("n",
      sum(col("c")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
    val p = col("c").cast("double") / col("n")
    val got = withN.groupBy(col("doc_id"))
      .agg(round(-sum(p * log2(p)), 6).as("e"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 2.0) // 4 distinct of 4 -> log2(4)
    assert(got(2L) == 0.0) // all same -> 0 (negated -0.0 must render 0.0)
    assert(got(3L) == 1.0) // two at p=0.5
    // and the real query runs over the corpus with sane bounds
    val corpus = graft.llmops.TextStats.xWordEntropy.build(spark, sf)
      .as[(Long, Double, Long)].collect()
    assert(corpus.nonEmpty)
    corpus.foreach { case (id, e, nd) =>
      assert(e >= 0.0 && e <= math.log(nd.toDouble.max(1)) / math.log(2) + 1e-6,
        s"doc $id entropy $e out of [0, log2($nd)]")
    }
  }

  test("pop growth: cents reconcile to the exact total and deltas chain") {
    val out = Timeseries.xPopGrowth.build(spark, sf)
      .as[(java.sql.Date, Long, Long, Long)].collect().sortBy(_._1.getTime)
    assert(out.nonEmpty)
    // consecutive months chain: this row's prev equals last row's cur
    out.sliding(2).foreach {
      case Array(a, b) => assert(b._3 == a._2, s"chain break at ${b._1}")
      case _ =>
    }
    out.foreach { case (m, cur, prev, g) =>
      val expected = if (cur - prev < 0) -((1000000L * (prev - cur)) / prev)
                     else (1000000L * (cur - prev)) / prev
      assert(g == expected, s"month $m")
    }
    // exact reconciliation: sum of monthly cents (incl. the first month
    // the growth rows drop) equals the corpus total in exact decimal
    val total = graft.core.Tables(spark, sf, "orders")
      .agg((sum(graft.core.Exact.dec(col("o_totalprice"))) * 100)
        .cast("long")).as[Long].collect().head
    val monthly = graft.core.Tables(spark, sf, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg((sum(graft.core.Exact.dec(col("o_totalprice"))) * 100)
        .cast("long").as("c")).as[(java.sql.Timestamp, Long)].collect()
    assert(monthly.map(_._2).sum == total)
    info(s"${out.length} growth rows, growth range " +
      s"${out.map(_._4).min / 1e6}..${out.map(_._4).max / 1e6}")
  }

  test("pct of parent: shares sum to the parent within floor error") {
    val out = Timeseries.xPctOfParent.build(spark, sf)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (region, rows) =>
      val rCents = rows.head._4
      assert(rows.forall(_._4 == rCents))
      assert(rows.map(_._3).sum == rCents,
        s"$region: nation cents must sum to the region exactly")
      // integer-floor shares undershoot by < 1e-6 per nation
      val shareSum = rows.map(_._5).sum
      assert(shareSum <= 1000000L && shareSum > 1000000L - rows.length,
        s"$region: share sum $shareSum")
    }
    val totalShare = out.map(_._6).sum
    assert(totalShare <= 1000000L && totalShare > 1000000L - out.length)
    info(s"${out.length} nations across ${out.map(_._1).distinct.length} regions")
  }
}
