package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class ExtraSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("sessionize splits on >30min gaps and numbers sessions per user") {
    val rows = Extra.xSessionize.build(spark, sf)
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // session ids are dense from 1 within each user
    rows.groupBy(_._1).foreach { case (_, ss) =>
      val ids = ss.map(_._2).sorted
      assert(ids.head == 1L && ids.last == ids.length.toLong)
    }
    // event count is conserved: sum of session sizes == events per user
    val perUser = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val expected = graft.core.Tables(spark, sf, "events")
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    assert(perUser == expected)
  }

  test("hash sampling is deterministic and in the expected range") {
    val a = Extra.xSampleHash.build(spark, sf).as[(Long, String)].collect()
    val b = Extra.xSampleHash.build(spark, sf).as[(Long, String)].collect()
    assert(a.toSeq == b.toSeq)
    val total = graft.core.Tables(spark, sf, "documents").count()
    // 21/256 ≈ 8.2% expected; allow a generous band for a 500-doc corpus
    assert(a.length > total * 0.02 && a.length < total * 0.2)
  }

  test("string_agg output is sorted within each group") {
    val rows = Extra.xStringAgg.build(spark, sf).as[(Long, String)].collect()
    assert(rows.length == 5)
    rows.foreach { case (_, names) =>
      val parts = names.split(",").toSeq
      assert(parts == parts.sorted)
    }
  }

  test("redaction masks every digit") {
    val rows = Extra.xRedact.build(spark, sf).select("masked").as[String].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(!_.exists(_.isDigit)))
    assert(rows.exists(_.contains("#")))
  }

  test("regression aggregates are finite per group") {
    val rows = Extra.xRegrAgg.build(spark, sf)
      .select("slope", "intercept", "r2").as[(Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (s, i, r) =>
      assert(!s.isNaN && !i.isNaN && r >= -1e-9 && r <= 1 + 1e-9)
    }
  }

  test("group top-k plans with WindowGroupLimit and returns <=3 rows per group") {
    val df = Extra.xGroupTopK.build(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
    val rows = df.as[(String, Long, Int)].collect()
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.length <= 3 && g.map(_._3).sorted.sameElements(1 to g.length))
    }
  }

  test("approx percentile sits within the declared 2% of exact") {
    val rows = Extra.xApproxPercentile.build(spark, sf)
      .select("within_2pct").as[Boolean].collect()
    assert(rows.nonEmpty && rows.forall(identity))
  }

  test("resample grid is hourly-contiguous per user and conserves events") {
    val rows = Extra.xResample.build(spark, sf)
      .select("user_id", "hour", "n")
      .as[(Long, java.sql.Timestamp, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, g) =>
      val hours = g.map(_._2.getTime).sorted
      hours.zip(hours.tail).foreach { case (a, b) =>
        assert(b - a == 3600 * 1000L, "grid must step exactly one hour")
      }
    }
    val total = graft.core.Tables(spark, sf, "events").count()
    assert(rows.map(_._3).sum == total)
  }

  test("tfidf returns 5 descending-scored terms per language") {
    val rows = graft.llmops.TextStats.xTfIdf.build(spark, sf)
      .as[(String, String, Double)].collect()
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.length == 5)
      val scores = g.map(_._3)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("jaro-winkler matches textbook vectors through the codegen path") {
    val df = Seq(
      ("MARTHA", "MARHTA", 0.961111), ("DWAYNE", "DUANE", 0.840000),
      ("DIXON", "DICKSONX", 0.813333), ("CRATE", "TRACE", 0.733333),
      ("abc", "abc", 1.0), ("", "abc", 0.0), ("", "", 0.0), ("a", "b", 0.0))
      .toDF("a", "b", "want")
      .select(col("want"),
        round(graft.functions.JaroWinkler.sim(col("a"), col("b")), 6).as("got"))
      .as[(Double, Double)].collect()
    df.foreach { case (want, got) => assert(math.abs(want - got) < 1e-6) }
  }

  test("components matches union-find on chains, merges, and duplicate edges") {
    // (edges, expected (id -> component-min)) — covers a 4-chain (3-hop
    // label propagation), a separate pair, duplicate edges, and a
    // late-merging bridge between two existing components
    val cases = Seq(
      Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L), (0L, 1L)) ->
        Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 10L -> 10L, 11L -> 10L),
      Seq((5L, 6L), (7L, 8L), (6L, 7L)) ->
        Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L),
      Seq((1L, 9L)) -> Map(1L -> 1L, 9L -> 1L))
    cases.foreach { case (edges, want) =>
      // driver union-find fast path (default threshold) AND the
      // distributed pointer-jumping loop (threshold 0) must agree
      val df = edges.toDF("a_id", "b_id")
      val fast = graft.llmops.DedupFamilies.components(df)
        .as[(Long, Long)].collect().toMap
      val dist = graft.llmops.DedupFamilies.components(df, driverThreshold = 0L)
        .as[(Long, Long)].collect().toMap
      assert(fast == want, s"driver path, edges=$edges")
      assert(dist == want, s"distributed path, edges=$edges")
    }
  }

  test("dedup families: survivors are component minima, singletons survive") {
    val fams = graft.llmops.DedupFamilies.xFamilies.build(spark, sf)
      .as[(Long, Long, Boolean)].collect()
    val total = graft.core.Tables(spark, sf, "documents").count()
    assert(fams.length == total)
    fams.foreach { case (doc, fam, surv) =>
      assert(fam <= doc)                 // family label is the component min
      assert(surv == (doc == fam))
    }
    // every family's labeled survivor exists
    val families = fams.map(_._2).toSet
    val survivors = fams.filter(_._3).map(_._1).toSet
    assert(families == survivors)
  }

  test("dedup survivors keep exactly the longest member of each family") {
    val fams = graft.llmops.DedupFamilies.xFamilies.build(spark, sf)
      .select("doc_id", "family").as[(Long, Long)].collect()
    val chars = graft.core.Tables(spark, sf, "documents")
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    val kept = graft.llmops.DedupFamilies.xSurvivors.build(spark, sf)
      .as[(Long, Long, Long)].collect()
    // one survivor per family, and it is the family argmax by
    // (n_chars desc, doc_id asc)
    val byFam = fams.groupBy(_._2)
    assert(kept.length == byFam.size)
    kept.foreach { case (doc, fam, n) =>
      assert(n == chars(doc))
      val members = byFam(fam).map(_._1)
      val want = members.minBy(id => (-chars(id), id))
      assert(doc == want, s"family $fam kept $doc, expected $want")
    }
  }

  test("datasetDiff classifies added/removed/changed and drops unchanged") {
    val v1 = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"),
      (4L, 40.0, "d")).toDF("k", "price", "status")
    val v2 = Seq((2L, 20.0, "b"), (3L, 31.0, "c"), (4L, 40.0, "e"),
      (5L, 50.0, "f")).toDF("k", "price", "status")
    val got = Extra.datasetDiff(v1, v2, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "changed",
      5L -> "added"))   // 2 is unchanged and absent
    // mismatched value schemas fail fast, not silently mis-hash
    intercept[IllegalArgumentException] {
      Extra.datasetDiff(v1, v2.withColumnRenamed("status", "st"), Seq("k"))
    }
    // a null SHIFT between columns is a change: xxhash64 skips null
    // children, so without null indicators (null, "x") and ("x", null)
    // fingerprint identically and the change vanishes
    val n1 = Seq((1L, Option.empty[String], Option("x")))
      .toDF("k", "a", "b")
    val n2 = Seq((1L, Option("x"), Option.empty[String]))
      .toDF("k", "a", "b")
    assert(Extra.datasetDiff(n1, n2, Seq("k"))
      .as[(Long, String)].collect().toMap == Map(1L -> "changed"))
  }
}
