package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.functions.GraftFunctions

class SkewAndFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted aggregate equals plain aggregate on a skewed key") {
    // 90% of rows share one key — the shape salting exists for
    val df = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong else 0L, 1.0))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").as[(Long, Long, Double)].collect().toSeq
    val salted = Skew.saltedAggregate(df, col("k"), salts = 8,
      partials = Seq(count(lit(1)).as("pn"), sum("v").as("ps")),
      combine = Seq(sum("pn").as("n"), sum("ps").as("s")))
      .orderBy("_key").as[(Long, Long, Double)].collect().toSeq
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val left = (1 to 5000).map(i => (if (i % 100 == 0) i.toLong else 7L, i))
      .toDF("lk", "payload")
    val right = (0 to 200).map(i => (i.toLong, s"r$i")).toDF("rk", "name")
    val plain = left.join(right, col("lk") === col("rk"))
      .select("lk", "payload", "name").as[(Long, Int, String)]
      .collect().toSet
    val salted = Skew.saltedJoin(left, right, "lk", "rk", salts = 8)
      .select("lk", "payload", "name").as[(Long, Int, String)]
      .collect().toSet
    assert(salted == plain)
  }

  test("x_skew_join_hub: salting measurably bounds the hub task (stage-metric bound)") {
    // AQE off for the measurement: OptimizeSkewedJoin would split the
    // naive hub partition at runtime and mask the comparison the bound
    // is about (salting must stand on its own where AQE can't help —
    // e.g. when the join is produced by an operator AQE won't rewrite)
    val sf = "/root/testdata/sf0.001"
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevSp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // broadcast off: salting's regime is a dim too big to broadcast — a
    // broadcast join would neither shuffle nor skew (and would make
    // spark_partition_id measure the scan layout, not key distribution)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // the test session pins shuffle.partitions=4 for suite speed; the
    // skew measurement needs enough reducers that the hub's 8 salt
    // cells actually land apart (production shape: partitions >> salts)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      val f = graft.core.Tables(spark, sf, "lineitem").select(
        when(col("l_orderkey") % 3 === 0, lit(1L)).otherwise(col("l_orderkey")).as("k"),
        lit(1L).as("cents"))
      val d = graft.core.Tables(spark, sf, "orders")
        .select(col("o_orderkey").as("kd"), col("o_orderpriority").as("pri"))
      val hub = f.filter(col("k") === 1L).count()
      def maxPart(df: org.apache.spark.sql.DataFrame): Long =
        df.groupBy(spark_partition_id().as("p")).count()
          .agg(max("count")).as[Long].head()
      val naive = maxPart(f.join(d, col("k") === col("kd")))
      val salted = maxPart(Skew.saltedJoin(f, d, "k", "kd", Skew.HUB_SALTS))
      assert(naive >= hub,
        s"naive plan should funnel the hub ($hub rows) into one task, max was $naive")
      assert(salted * 2 <= naive,
        s"salted max-partition $salted not measurably below naive $naive")
      // and the graded query itself returns the dim-sized exact rollup
      val rows = Skew.xSkewJoinHub.build(spark, sf)
        .as[(String, Long, Long)].collect()
      assert(rows.nonEmpty && rows.map(_._2).sum == f.join(d,
        col("k") === col("kd")).count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.shuffle.partitions", prevSp)
    }
  }

  test("array_dot is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .as[Double].head()
    assert(got == 32.0)
  }

  test("shingle-hash and minhash expressions are callable from SQL") {
    GraftFunctions.register(spark)
    // parity with the column function on the same text
    val viaSql = spark.sql(
      "SELECT word_shingle_hashes('a b c d', 3) AS hs")
      .as[Seq[Long]].head()
    val viaCol = Seq("a b c d").toDF("text")
      .select(graft.functions.ArrayOps.wordShingleHashes(col("text"), 3).as("hs"))
      .as[Seq[Long]].head()
    assert(viaSql == viaCol && viaSql.length == 2)
    val chars = spark.sql(
      "SELECT size(char_shingle_hashes('abcdef', 5)) AS n").as[Int].head()
    assert(chars == 2)
    val sig = spark.sql(
      "SELECT size(minhash_signature(word_shingle_hashes('a b c d', 3), 32)) AS n")
      .as[Int].head()
    assert(sig == 32)
    // non-literal k fails fast with the function name
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingle_hashes('a b c', cast(rand()*3 AS INT))")
        .collect()
    }
    assert(e.getMessage.contains("word_shingle_hashes"))
  }

  test("winnow_fingerprints is callable from SQL and matches the column form") {
    GraftFunctions.register(spark)
    val text = "a b c d e f g h i j"
    val viaSql = spark.sql(
      s"SELECT winnow_fingerprints('$text', 3, 4) AS fps")
      .as[Seq[String]].head()
    val viaCol = Seq(text).toDF("text")
      .select(graft.functions.ArrayOps.winnowFingerprints(col("text"), 3, 4).as("fps"))
      .as[Seq[String]].head()
    assert(viaSql == viaCol && viaSql.nonEmpty)
    // each fingerprint is one of the text's 3-gram md5s (selection only
    // ever picks real gram digests)
    val grams = text.split(" ").sliding(3).map(_.mkString(" ")).toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    val valid = grams.map(g => md.digest(g.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString).toSet
    assert(viaSql.forall(valid))
  }

  test("jaro_winkler_similarity and sorted_intersect_count from SQL") {
    GraftFunctions.register(spark)
    val jw = spark.sql(
      "SELECT round(jaro_winkler_similarity('MARTHA', 'MARHTA'), 6) AS s")
      .as[Double].head()
    assert(math.abs(jw - 0.961111) < 1e-9)
    val n = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS n")
      .as[Long].head()
    assert(n == 2L)
  }
}
