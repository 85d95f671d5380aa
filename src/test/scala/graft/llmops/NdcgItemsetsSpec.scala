package graft.llmops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class NdcgItemsetsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  private def w(i: Int): Long = math.round(1e6 / (math.log(i + 1) / math.log(2)))

  test("ndcg matches a driver-side recompute over the exact ranking") {
    for (dir <- dirs) {
      val vecs = VectorSearch.embeddingsBase(spark, dir)
        .select("vec_id", "label", "n_emb")
        .as[(Long, Int, Seq[Double])].collect()
      val out = RetrievalEval.xNdcgEval.build(spark, dir)
        .as[(Long, Long, Long, Long, Long)].collect()
      assert(out.length == RetrievalEval.NPROBE)
      out.foreach { case (pid, nRel, dcg, idcg, ndcg) =>
        val (_, pLabel, pEmb) = vecs.find(_._1 == pid).get
        val ranked = vecs.filter(_._1 != pid)
          .map { case (id, l, e) =>
            val sim = BigDecimal(e.iterator.zip(pEmb.iterator)
              .map { case (x, y) => x * y }.sum)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP)
            (id, l, sim)
          }
          .sortBy { case (id, _, sim) => (-sim, id) }
          .take(RetrievalEval.TOPK)
        val expDcg = ranked.zipWithIndex.collect {
          case ((_, l, _), i) if l == pLabel => w(i + 1)
        }.sum
        val expRel = vecs.count(v => v._1 != pid && v._2 == pLabel)
        val expIdcg =
          (1 to math.min(RetrievalEval.TOPK, expRel)).map(w).sum
        assert(nRel == expRel, s"$dir probe $pid n_rel")
        assert(dcg == expDcg, s"$dir probe $pid dcg")
        assert(idcg == expIdcg, s"$dir probe $pid idcg")
        assert(ndcg == 1000000L * dcg / idcg)
        assert(ndcg >= 0 && ndcg <= 1000000L)
      }
      // the metric must discriminate: not all probes identical
      assert(out.map(_._5).distinct.length > 1,
        s"$dir: NDCG constant across probes — fixture uninformative")
      info(s"$dir: NDCG range ${out.map(_._5).min / 1e6} .. " +
        s"${out.map(_._5).max / 1e6} over ${out.length} probes")
    }
  }

  test("itemset rules match a brute-force basket recount") {
    for (dir <- dirs) {
      val items = graft.core.Tables(spark, dir, "lineitem")
        .select(org.apache.spark.sql.functions.col("l_orderkey"),
          org.apache.spark.sql.functions.col("l_partkey"))
        .as[(Long, Long)].collect().distinct
      val nOrders = items.map(_._1).distinct.length.toLong
      val single = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val pairSupp = items.groupBy(_._1).values.toSeq
        .flatMap { basket =>
          val ps = basket.map(_._2).sorted
          for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
        }
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
        .filter(_._2 >= graft.ops.Itemsets.MINSUP)
      val expTop = pairSupp.toSeq
        .sortBy { case ((a, b), s) => (-s, a, b) }
        .take(graft.ops.Itemsets.TOPN)
      val out = graft.ops.Itemsets.xFreqItemsets.build(spark, dir)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      assert(out.length == expTop.length)
      out.zip(expTop).foreach {
        case ((pa, pb, sab, sa, sb, n, conf, lift), ((ea, eb), es)) =>
          assert((pa, pb, sab) == (ea, eb, es), s"$dir rule order")
          assert(sa == single(pa) && sb == single(pb))
          assert(n == nOrders)
          assert(conf == 1000000L * sab / sa)
          assert(lift == 1000000L * sab * n / (sa * sb))
      }
      val lifted = out.count(_._8 > 1000000L)
      info(s"$dir: ${out.length} rules (min supp ${out.map(_._3).min}), " +
        s"$lifted with lift > 1")
    }
  }
}
