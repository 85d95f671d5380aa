package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Round-13 additions: ACF, weighted-cosine all-pairs, Bradley-Terry.
  * Each test replicates the operator's math in plain driver-side Scala
  * (exact integer arithmetic, no Spark) and asserts bit-equality — the
  * same yardstick discipline as SetSimSpec / GraftProps.
  */
class Round13Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val SF = "/root/testdata/sf0.001"

  test("x_autocorr equals the driver-side direct ACF estimate") {
    val daily = graft.core.Tables(spark, SF, "events")
      .selectExpr("cast(ts as date) as day")
      .groupBy("day").count()
      .as[(java.sql.Date, Long)].collect()
      .map { case (d, c) => d.toLocalDate -> c }.toMap

    def statsAt(lag: Int): (Long, Long, Long, Long, Long, Long) = {
      val pairs = daily.toSeq.flatMap { case (d, x) =>
        daily.get(d.plusDays(lag)).map(y => (x, y)) }
      val n = pairs.size.toLong
      (n, pairs.map(_._1).sum, pairs.map(_._2).sum,
        pairs.map(p => p._1 * p._2).sum,
        pairs.map(p => p._1 * p._1).sum,
        pairs.map(p => p._2 * p._2).sum)
    }

    val got = Timeseries.xAutocorr.build(spark, SF)
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect()
    assert(got.map(_._1).toSeq == (1L to Timeseries.ACF_MAX_LAG))
    got.foreach { case (lag, n, cov, vx, vy, acf) =>
      val (rn, sx, sy, sxy, sxx, syy) = statsAt(lag.toInt)
      assert(n == rn, s"n at lag $lag")
      assert(cov == rn * sxy - sx * sy, s"cov at lag $lag")
      assert(vx == rn * sxx - sx * sx, s"vx at lag $lag")
      assert(vy == rn * syy - sy * sy, s"vy at lag $lag")
      if (vx != 0 && vy != 0) {
        val expected = math.round(
          1e6 * cov.toDouble / math.sqrt(vx.toDouble * vy.toDouble))
        assert(acf.contains(expected), s"acf at lag $lag")
        assert(math.abs(acf.get) <= 1000000L)
      } else assert(acf.isEmpty)
    }
  }

  /** Brute-force UNCAPPED weighted cosine over 5-gram count vectors:
    * every pair, full dot product, 25·dot² ≥ 16·na2·nb2. The operator's
    * df-cap contract only prunes CANDIDATES whose shared vocabulary is
    * all hubs; on this fixture every true near-dup pair shares sub-cap
    * 5-grams, so capped output must equal the brute force exactly.
    */
  test("x_allpairs_cosine equals uncapped brute force on sf0.001") {
    import graft.llmops.AllPairs
    val docs = graft.core.Tables(spark, SF, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val vecs = docs.map { case (id, t) =>
      val grams = t.split(" ", -1).sliding(AllPairs.NGRAM)
        .filter(_.length == AllPairs.NGRAM).map(_.mkString(" ")).toSeq
      id -> grams.groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    }.filter(_._2.nonEmpty)
    val brute = (for {
      (a, va) <- vecs; (b, vb) <- vecs if a < b
      dot = va.keysIterator.map(g => va(g) * vb.getOrElse(g, 0L)).sum
      na2 = va.valuesIterator.map(c => c * c).sum
      nb2 = vb.valuesIterator.map(c => c * c).sum
      if 25L * dot * dot >= 16L * na2 * nb2
    } yield (a, b, dot, na2, nb2)).toSet

    val got = AllPairs.xAllpairsCosine.build(spark, SF)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.sortBy(r => (r._1, r._2)).toSeq == got.toSeq)
    assert(got.toSet == brute)
    assert(got.nonEmpty) // planted near-dup families must surface
  }

  /** Replicates the fixed-point MM solve exactly (BigInt floor-div, same
    * iteration count) from a driver-built win matrix; asserts the
    * engine's ratings are bit-identical and ranks are consistent.
    */
  test("x_bt_rating matches the driver-side fixed-point MM solve") {
    import graft.llmops.Preference._
    val uc = graft.core.Tables(spark, SF, "events")
      .groupBy("user_id", "event_type").count()
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val players = uc.valuesIterator.flatMap(_.keys).toSet.toSeq.sorted
    val nij = (for {
      i <- players; j <- players if i != j
    } yield (i, j) -> uc.valuesIterator.count(m =>
      m.contains(i) && m.contains(j) && m(i) > m(j)).toLong).toMap
    val games = (for { i <- players; j <- players if i != j }
      yield (i, j) -> (nij((i, j)) + nij((j, i)))).toMap
    val wins = players.map(i =>
      i -> players.filter(_ != i).map(j => nij((i, j))).sum).toMap

    var pi = players.map(_ -> BT_INIT).toMap
    for (_ <- 1 to BT_ITERS) {
      pi = players.map { i =>
        val d = players.filter(_ != i)
          .map(j => games((i, j)) * BT_K / (pi(i) + pi(j))).sum
        i -> math.max(wins(i) * BT_K / d, 1L)
      }.toMap
    }
    val expected = players
      .map(i => (i, players.filter(_ != i).map(j => games((i, j))).sum,
        wins(i), pi(i)))
      .sortBy { case (i, _, _, p) => (-p, i) }
      .zipWithIndex
      .map { case ((i, g, w, p), k) => (i, g, w, p, k + 1L) }

    val got = xBtRating.build(spark, SF)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._1).toSet == players.toSet)
  }
}
