package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The GENERALIZED rounding-margin audit (round-9 verdict item #5).
  *
  * Every query that rounds a transcendental/irrational double before
  * hashing relies on the same safety argument: the hash contract
  * tolerates a few-ulp libm difference between engines ONLY because no
  * true value sits close enough to a ROUNDING DECISION BOUNDARY for
  * that difference to flip the rounded result. Previously the argument
  * was MEASURED only for BM25 (GraphSpec) and the temperature-mix
  * weights (Round9Spec); every other rounding query cited it by
  * analogy. This spec is the single table: each family contributes its
  * raw (pre-round) values, and the measured minimum boundary distance
  * is recorded (info) and gated (assert).
  *
  * Two boundary kinds:
  *   - `round(v·scale)` flips at half-multiples — distance is
  *     |frac(v·scale) − 0.5| (in SCALED units; a value sitting exactly
  *     ON a representable multiple is maximally safe);
  *   - `floor(v·scale)` flips at whole multiples — distance is
  *     min(frac, 1 − frac).
  *
  * Bars are per family, in scaled units, each ≥3 orders above the
  * libm-difference threat for that family's magnitude and below the
  * measured minimum (printed on every run; tighten deliberately, not
  * silently).
  */
class RoundingMarginSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def halfMargin(scaled: Double): Double = {
    val f = scaled - math.floor(scaled)
    math.abs(f - 0.5)
  }
  private def floorMargin(scaled: Double): Double = {
    val f = scaled - math.floor(scaled)
    math.min(f, 1 - f)
  }

  private case class Fam(
      name: String, kind: String, bar: Double, values: Seq[Double])

  private def audit(dir: String, fams: Seq[Fam]): Unit =
    fams.foreach { f =>
      assert(f.values.nonEmpty, s"${f.name}: no values to audit")
      // (recomputed below after the floor exemption)
      // exact-dyadic exemption (floor families): a scaled value landing
      // EXACTLY on an integer came from IEEE correctly-rounded rational
      // arithmetic (+,*,/,min of integers — no libm anywhere), which is
      // bit-identical across engines, so both floor it the same way;
      // e.g. x_mix_sample's fr threshold 30/64·65536 = 30720 exactly
      val vals = if (f.kind == "floor")
        f.values.filter(v => v != math.floor(v)) else f.values
      val margins = vals.map(v =>
        if (f.kind == "floor") floorMargin(v) else halfMargin(v))
      if (margins.isEmpty)
        info(f"$dir ${f.name}%-28s n=${f.values.length}%6d all exact-dyadic")
      else {
        info(f"$dir ${f.name}%-28s n=${f.values.length}%6d " +
          f"min-margin=${margins.min}%.3e (bar ${f.bar}%.0e, ${f.kind})")
        assert(margins.min > f.bar,
          s"$dir ${f.name}: margin ${margins.min} under bar ${f.bar}")
      }
    }

  test("every rounded-double query family sits clear of its decision boundaries") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.core.Tables(spark, dir, "documents")
      val li = graft.core.Tables(spark, dir, "lineitem")

      // ---- round(·, 6) families (scale 1e6, half boundaries) ----

      // x_bm25 (the original GraphSpec audit, now a table row)
      val bm25 = TextStats.bm25Raw(spark, dir)
        .select("raw").as[Double].collect().filter(_ != 0.0)
        .map(_ * 1e6)

      // q34 / x_knn_label / x_hard_negatives / x_rrf_fusion semantic arm:
      // every probe-vs-corpus cosine that feeds a round(sim, 6) rank
      val e = VectorSearch.embeddingsBase(spark, dir)
        .select(col("vec_id"), col("n_emb"))
      val cosines = e.crossJoin(broadcast(
          e.filter(col("vec_id") < 5)
            .select(col("vec_id").as("pid"), col("n_emb").as("p_emb"))))
        .filter(col("vec_id") =!= col("pid"))
        .select(VectorSearch.dot(col("n_emb"), col("p_emb")).as("s"))
        .as[Double].collect().map(_ * 1e6)

      // q22 transcendental projections over lineitem
      val trans = li.select(
          log(col("l_extendedprice")).as("a"),
          log10(col("l_extendedprice")).as("b"),
          exp(col("l_discount")).as("c"))
        .as[(Double, Double, Double)].collect()
        .flatMap(t => Seq(t._1, t._2, t._3)).map(_ * 1e6)

      // x_word_entropy: per-doc −Σ p·log2 p (zero-entropy docs exempt —
      // computed exactly by both engines)
      val entropy = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n"), collect_list("c").as("cs"))
        .as[(Long, Long, Seq[Long])].collect()
        .map { case (_, n, cs) =>
          -cs.map { c =>
            val p = c.toDouble / n; p * math.log(p) / math.log(2.0)
          }.sum
        }.filter(_ != 0.0).map(_ * 1e6)

      // x_tfidf: tf · ln(n_docs / df) for every (lang, term)
      val terms = docs.select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("term")).distinct()
      val nDocs = docs.count().toDouble
      val tfidf = terms.groupBy("lang", "term").agg(count(lit(1)).as("tf"))
        .join(terms.groupBy("term").agg(count(lit(1)).as("df")), "term")
        .select(col("tf"), col("df")).as[(Long, Long)].collect()
        .map { case (tf, df) => tf * math.log(nDocs / df) }
        .filter(_ != 0.0).map(_ * 1e6)

      // x_ccnet_buckets / x_lm_crossppl / x_bigram_lm: per-doc average
      // NLL (raw, pre-round). This family's threat is larger than bare
      // libm wobble: the per-doc Σ(−ln ...) is addition-order-dependent
      // between engines, which is exactly why the queries round at 6
      // decimals — the audit shows the boundary gap dwarfs both effects
      val nll = LangModel.avgNllCross(docs, docs,
          cacheKey = "margin.nll", raw = true)
        .select("nll").as[Double].collect().map(_ * 1e6)

      // ---- integer fixed-point families ----

      // x_dsir_weights: the 64 bucketed ln importance ratios × 1e6
      val dsirHist = docs
        .select(explode(split(col("text"), " ")).as("w"), col("lang"))
        .filter(col("w") =!= "")
        .select((conv(substring(md5(col("w")), 1, 4), 16, 10).cast("int")
          % TextStats.DSIR_DIM).as("b"), col("lang"))
        .groupBy("b")
        .agg(count(lit(1)).as("rc"),
          count(when(col("lang") === "en", 1)).as("tc"))
        .as[(Int, Long, Long)].collect()
      val rt = dsirHist.map(_._2).sum.toDouble
      val tt = dsirHist.map(_._3).sum.toDouble
      val dsir = dsirHist.map { case (_, rc, tc) =>
        TextStats.DSIR_SCALE * math.log(
          ((tc + 1.0) / (tt + TextStats.DSIR_DIM)) /
            ((rc + 1.0) / (rt + TextStats.DSIR_DIM)))
      }.toSeq

      // x_temperature_mix: pow weights (round ×1e9) and md5-threshold
      // floors (×65536)
      val tRows = Curation.temperatureThresholds(docs)
      val tnn = tRows.map(_._2).sum
      val tPow = tRows.map { case (_, n, _, _) =>
        math.pow(n.toDouble / tnn, Curation.TEMP_ALPHA) * 1e9 }.toSeq
      val tsw = tRows.map(_._3).sum
      val tThr = tRows.map { case (_, n, w, _) =>
        math.min(1.0, (w.toDouble / tsw) * (tnn / 5.0) / n) * 65536 }.toSeq

      // x_full_curation stage 9: same formulas over the pipeline's own
      // survivor counts
      val fCounts = FullCuration.mixInputCounts(FullCuration.semStage(spark, dir))
      val fnn = fCounts.map(_._2).sum
      val fPow = fCounts.map { case (_, n) =>
        math.pow(n.toDouble / fnn, Curation.TEMP_ALPHA) * 1e9 }.toSeq
      val fW = fCounts.map { case (_, n) =>
        math.round(math.pow(n.toDouble / fnn, Curation.TEMP_ALPHA) * 1e9) }
      val fsw = fW.sum
      val fThr = fCounts.zip(fW).map { case ((_, n), w) =>
        math.min(1.0, (w.toDouble / fsw) * (fnn / 5.0) / n) * 65536 }.toSeq

      // x_mix_sample: fixed target weights → floor(frac · 65536)
      val langN = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      val mixThr = Curation.MixWeights.flatMap { case (l, wt) =>
        langN.get(l).map(nl =>
          math.min(1.0, wt * Curation.MixBudget / nl) * 65536) }

      // x_psi_drift: per-bin ln importance ratios × 1e6
      val psiHist = docs.select(
          expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")
            .cast("long").as("n_tok"),
          (col("doc_id") <= Incremental.cutoffValue(docs)).as("ref"))
        .select(expr(s"n_tok div ${Drift.PSI_BIN}").as("bin"), col("ref"))
        .groupBy("bin").agg(
          sum(when(col("ref"), 1L).otherwise(0L)).as("a"),
          sum(when(col("ref"), 0L).otherwise(1L)).as("b"))
        .as[(Long, Long, Long)].collect()
      val (pta, ptb, pk) =
        (psiHist.map(_._2).sum, psiHist.map(_._3).sum, psiHist.length)
      val psi = psiHist.map { case (_, a, b) =>
        Drift.PSI_SCALE * math.log(((a + 1.0) / (pta + pk)) /
          ((b + 1.0) / (ptb + pk)))
      }.toSeq

      // x_stream_psi: per-(day, bin) ln importance ratios × 1e6 (same
      // formula class as psi-weights, over the streaming gold histogram's
      // day-split domain — recomputed batch-side here)
      val spH = graft.core.Tables(spark, dir, "events")
        .select(to_date(col("ts")).as("day"),
          expr("cast(round(value * 100) as bigint) div 5000").as("bin"))
        .groupBy("day", "bin").agg(count(lit(1)).as("n"))
        .as[(java.sql.Date, Long, Long)].collect()
      val cutD = java.sql.Date.valueOf("2024-01-16")
      val refH = spH.filter(_._1.before(cutD)).groupBy(_._2).view
        .mapValues(_.map(_._3).sum).toMap
      val spA = refH.values.sum
      val dayRows = spH.filterNot(_._1.before(cutD))
      val streamPsi = dayRows.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        val dayH = rows.map(r => r._2 -> r._3).toMap
        val dom = (refH.keySet ++ dayH.keySet).toSeq
        val bd = dayH.values.sum
        val k = dom.size
        dom.map { b =>
          1e6 * math.log(((refH.getOrElse(b, 0L) + 1.0) / (spA + k)) /
            ((dayH.getOrElse(b, 0L) + 1.0) / (bd + k)))
        }
      }

      // x_rag_pipeline: raw MaxSim over the fused-20 pool and raw
      // pairwise cosines over its reranked-10 (both feed 1e6 fixed
      // points; the LateInteraction/Mmr families cover different pools)
      val ragMs = Rag.rerankRaw(spark, dir)
        .select("msraw").as[Double].collect().map(_ * 1e6)
      val ragTop = Rag.rerankRaw(spark, dir)
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(round(col("msraw"), 6).desc, col("doc_id"))))
        .filter(col("r") <= Rag.RERANK_TOP).select(col("doc_id"))
      val ragEmb = ragTop.join(VectorSearch.embeddingsBase(spark, dir),
          ragTop("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("n_emb"))
      val ragPair = ragEmb.select(col("doc_id").as("a"), col("n_emb").as("ea"))
        .crossJoin(broadcast(ragEmb.select(col("doc_id").as("b"),
          col("n_emb").as("eb"))))
        .filter(col("a") =!= col("b"))
        .select(VectorSearch.dot(col("ea"), col("eb")).as("s"))
        .as[Double].collect().map(_ * 1e6)

      // x_entity_resolution: raw Jaro-Winkler over all blocked pairs ×
      // 1e6 (feeds the round + fixed JW_TH comparison)
      val erRecs = EntityResolution.records(spark, dir)
      val erJw = {
        val l = erRecs.select(col("k").as("a"), col("name").as("an"),
          substring(col("name"), 1, 1).as("blk"))
        val r = erRecs.select(col("k").as("b"), col("name").as("bn"),
          substring(col("name"), 1, 1).as("blk"))
        l.join(r, Seq("blk")).filter(col("a") < col("b"))
          .select(graft.functions.JaroWinkler.sim(col("an"), col("bn"))
            .as("s"))
          .as[Double].collect().map(_ * 1e6)
      }

      // x_bitext_mine: every source×target cosine × 1e6 (feeds the
      // integer margin arithmetic; grid() rounds, so recompute raw)
      val bitextRaw = {
        val e = VectorSearch.embeddingsBase(spark, dir)
          .select(col("vec_id"), col("emb"))
        val n = e.count()
        val nxt = e.select(((col("vec_id") - 1 + n) % n).as("vec_id"),
          col("emb").as("emb_next"))
        val tgt = e.join(nxt, "vec_id")
          .filter(col("vec_id") % 2 === 0)
          .withColumn("mix",
            expr("zip_with(emb, emb_next, (a, b) -> a + 0.1 * b)"))
          .select(expr(
            """transform(mix, x -> x / sqrt(aggregate(zip_with(mix, mix,
               (a, b) -> a * b), 0D, (ac, v) -> ac + v)))""").as("t_emb"))
        VectorSearch.embeddingsBase(spark, dir).select(col("n_emb"))
          .crossJoin(tgt)
          .select(VectorSearch.dot(col("n_emb"), col("t_emb")).as("s"))
          .as[Double].collect().map(_ * 1e6)
      }

      // x_unigram_*: seed and refit log-probs × 1e6
      val U = Unigram
      val hist = U.wordHist(docs)
      val cand = U.candidates(hist)
      val singles = cand.filter(length(col("p")) === 1)
        .select("p", "freq").as[(String, Long)].collect().sortBy(_._1)
      val multis = cand.filter(length(col("p")) >= 2)
        .orderBy(col("freq").desc, col("p")).limit(U.SEED_MULTI)
        .select("p", "freq").as[(String, Long)].collect()
      val t0 = (singles ++ multis).map(_._2).sum
      val lp0 = (singles ++ multis).map { case (_, f) =>
        U.LP_SCALE * math.log(f.toDouble / t0) }.toSeq
      val (vocab, _) = U.train(docs)
      val tu = vocab.map(_._2).sum
      val nv = vocab.length
      val lp1 = vocab.map { case (_, u, _) =>
        U.LP_SCALE * math.log((u + 1.0) / (tu + nv)) }.toSeq

      // x_audio_fingerprint: the 2·K·W fixed-point DFT trig weights
      // (data-independent grid; measured min margin 1.7e-2)
      val AF = AudioFingerprint
      val trig = (for (n <- 0 until AF.W; k <- 1 to AF.K) yield {
        val th = 2.0 * math.Pi * k * n / AF.W
        Seq(AF.TRIG_SCALE * math.cos(th), AF.TRIG_SCALE * math.sin(th))
      }).flatten

      // x_maxsim_rerank: raw per-pair MaxSim sums over the coarse pool
      val maxsim = LateInteraction.maxsimRaw(spark, dir)
        .select("maxsim").as[Double].collect().map(_ * 1e6)

      // x_mmr_diversify: raw cosines feeding both fixed-point arms —
      // probe→candidate relevance and within-pool pairwise similarity
      val mmrPool = Mmr.pool(spark, dir)
      val mmrRel = mmrPool
        .join(VectorSearch.embeddingsBase(spark, dir)
            .filter(col("vec_id") < Mmr.NPROBE)
            .select(col("vec_id").as("probe_id"), col("n_emb").as("p_emb")),
          "probe_id")
        .select(VectorSearch.dot(col("n_emb"), col("p_emb")).as("s"))
        .as[Double].collect().map(_ * 1e6)
      val mmrPairRaw = {
        val l = mmrPool.select(col("probe_id"), col("vec_id").as("a"),
          col("n_emb").as("ea"))
        val r = mmrPool.select(col("probe_id"), col("vec_id").as("b"),
          col("n_emb").as("eb"))
        l.join(r, "probe_id").filter(col("a") =!= col("b"))
          .select(VectorSearch.dot(col("ea"), col("eb")).as("s"))
          .as[Double].collect().map(_ * 1e6)
      }

      // x_bleu_eval: the single corpus BLEU double (exp·sqrt over six
      // exact integers) × 1e6
      val bleu = Seq(Overlap.bleuRaw(spark, dir) * 1e6)

      // x_chrf_eval: the single corpus chrF double (harmonic-mean ratio
      // over nine exact integers) × 1e6
      val chrf = Seq(Overlap.chrfRaw(spark, dir) * 1e6)

      // x_hll_custom: the 63 linear-counting constants 1e6·ln(64/V) plus
      // the single α_64 fixed point (data-independent grid, audio-trig
      // class)
      val hllTable = (1 to 63).map(v => 1e6 * math.log(64.0 / v)) :+
        (1e6 * 0.7213 / (1.0 + 1.079 / 64.0))

      // x_negative_sampling: 1e6·count^0.75 per vocabulary entry
      // (model-sized — one value per word)
      val negPow = docs
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("n"))
        .select("n").as[Long].collect()
        .map(n => 1e6 * math.pow(n.toDouble, 0.75))

      // x_zipf_fit: the fixed-point ln(rank)/ln(count) grid (model-sized
      // — two values per vocabulary entry)
      val zipfLn = {
        val counts = docs
          .select(explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(count(lit(1)).as("n"))
          .select("n").as[Long].collect()
        counts.indices.map(i => 1e6 * math.log(i + 1.0)) ++
          counts.map(n => 1e6 * math.log(n.toDouble))
      }

      // x_log_odds: the four smoothed-count ln args per vocabulary entry
      // (+ x_tail_index's top-k subset rides the zipf-ln family above)
      val logOdds = {
        val cs = docs
          .select((col("lang") === "en").as("g"),
            explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(
            sum(when(col("g"), 1L).otherwise(0L)).as("a"),
            sum(when(!col("g"), 1L).otherwise(0L)).as("b"))
          .as[(String, Long, Long)].collect()
        val ta = cs.map(_._2).sum; val tb = cs.map(_._3).sum
        cs.flatMap { case (_, a, b) =>
          Seq(a + 1, ta - a + 1, b + 1, tb - b + 1)
        }.map(m => 1e6 * math.log(m.toDouble))
      }

      // x_ctr_wilson: the per-type Wilson lower bounds × 1e6
      val wilson = graft.core.Tables(spark, dir, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") > 50, 1L).otherwise(0L)).as("s"))
        .as[(String, Long, Long)].collect()
        .map { case (_, n, s) =>
          val p = s.toDouble / n
          1e6 * ((p + 1.9208 / n - 1.96 * math.sqrt(
            p * (1.0 - p) / n + 0.9604 / (n.toDouble * n))) /
            (1.0 + 3.8416 / n))
        }

      // x_rolling_corr: the full-window Pearson values × 1e6
      val rollCorr = {
        val d = graft.core.Tables(spark, dir, "events")
          .groupBy(col("ts").cast("date").cast("string").as("day"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("y"))
          .as[(String, Long, Long)].collect().sortBy(_._1)
        val W = graft.ops.Timeseries.CORR_WIN
        d.indices.flatMap { i =>
          if (i < W - 1) None else {
            val win = d.slice(i - W + 1, i + 1)
            val n = win.length.toLong
            val sx = win.map(_._2).sum; val sy = win.map(_._3).sum
            val cov = n * win.map(r => r._2 * r._3).sum - sx * sy
            val vx = n * win.map(r => r._2 * r._2).sum - sx * sx
            val vy = n * win.map(r => r._3 * r._3).sum - sy * sy
            if (vx == 0 || vy == 0) None
            else Some(1e6 * (cov.toDouble / math.sqrt(vx.toDouble * vy.toDouble)))
          }
        }
      }

      // x_dp_budget: the advanced-composition bound × 1e6 over the
      // fixture's per-user release counts
      val dpAdv = {
        val G = Governance
        graft.core.Tables(spark, dir, "events")
          .filter(col("user_id") < 60)
          .groupBy("user_id")
          .agg(countDistinct(col("ts").cast("date")).as("k"))
          .select("k").as[Long].collect()
          .map(k => 1e6 * (math.sqrt(2.0 * k * G.DP_LN_INV_DELTA) *
            G.DP_EPS + k * G.DP_EPS * G.DP_EGROW))
      }

      // x_jackknife_se: the single sqrt over the exact integer ratio × 1e6
      val jkSe = {
        val xs = docs.select(col("n_chars")).as[Long].collect()
        val n = xs.length.toDouble
        val s = xs.sum.toDouble
        val ssq = xs.map(x => (s - n * x) * (s - n * x)).sum
        Seq(1e6 * math.sqrt(ssq / (n * n * n * (n - 1))))
      }

      // x_cluster_silhouette: the full all×all pair grid × 1e6 (a
      // superset of labelprop-grid; same shrinking-boundary argument)
      val silhouetteGrid = {
        val e = VectorSearch.embeddingsBase(spark, dir)
          .select("vec_id", "n_emb")
        e.select(col("vec_id").as("i"), col("n_emb").as("ei"))
          .crossJoin(e.select(col("vec_id").as("j"), col("n_emb").as("ej")))
          .filter(col("i") =!= col("j"))
          .select(VectorSearch.dot(col("ei"), col("ej")).as("s"))
          .as[Double].collect().map(_ * 1e6)
      }

      // x_silhouette_scaled: the n×k point-vs-quantized-centroid cosine
      // grid × 1e6 (integer dots → one double divide; the only libm step
      // is two correctly-rounded sqrts)
      val silhouetteCentroid = {
        val rows = VectorSearch.embeddingsBase(spark, dir)
          .select(col("vec_id"), col("label"), col("emb"))
          .as[(Long, Int, Seq[Double])].collect()
        val x = rows.map { case (_, l, v) =>
          (l, v.map(c => math.round(1e6 * c)).toArray) }
        def sdiv(a: Long, n: Long): Long = if (a < 0) -((-a) / n) else a / n
        val cents = x.groupBy(_._1).view.mapValues { g =>
          Array.tabulate(g.head._2.length)(i =>
            sdiv(g.map(_._2(i)).sum, g.length.toLong))
        }.toMap
        for ((_, xi) <- x; (_, m) <- cents.toSeq) yield {
          val dxm = xi.iterator.zip(m.iterator).map { case (p, q) => p * q }.sum
          val dxx = xi.iterator.map(p => p * p).sum
          val dmm = m.iterator.map(p => p * p).sum
          1e6 * (dxm.toDouble /
            (math.sqrt(dxx.toDouble) * math.sqrt(dmm.toDouble)))
        }
      }

      // x_label_prop: the full unlabeled×all ranking grid × 1e6
      val labelPropGrid = {
        val e = VectorSearch.embeddingsBase(spark, dir)
          .select("vec_id", "n_emb")
        val cut = LabelProp.seedCut(e)
        e.filter(col("vec_id") >= cut)
          .select(col("vec_id").as("u"), col("n_emb").as("u_emb"))
          .crossJoin(e.select(col("vec_id").as("v"), col("n_emb").as("v_emb")))
          .filter(col("u") =!= col("v"))
          .select(VectorSearch.dot(col("u_emb"), col("v_emb")).as("s"))
          .as[Double].collect().map(_ * 1e6)
      }

      // x_coreset_kcenter: every point-vs-chosen-center cosine × 1e6
      // (feeds the integer greedy argmin/argmax chain)
      val coresetSims = {
        val ids = Coreset.centers(spark, dir).map(_._2)
        val base = VectorSearch.embeddingsBase(spark, dir)
          .select("vec_id", "n_emb")
        base.crossJoin(broadcast(base.filter(col("vec_id").isin(ids: _*))
            .select(col("vec_id").as("cid"), col("n_emb").as("c_emb"))))
          .filter(col("vec_id") =!= col("cid"))
          .select(VectorSearch.dot(col("n_emb"), col("c_emb")).as("s"))
          .as[Double].collect().map(_ * 1e6)
      }

      audit(dir, Seq(
        Fam("bleu-corpus", "half", 1e-4, bleu),
        Fam("chrf-corpus", "half", 1e-4, chrf),
        Fam("hll-lin-table", "half", 1e-4, hllTable),
        Fam("negsample-pow", "half", 1e-4, negPow.toSeq),
        Fam("dp-advanced", "half", 1e-4, dpAdv.toSeq),
        Fam("zipf-ln", "half", 1e-4, zipfLn.toSeq),
        Fam("logodds-ln", "half", 1e-4, logOdds.toSeq),
        Fam("sprt-llr", "half", 1e-4, Seq(
          1e6 * math.log(0.15 / 0.10), 1e6 * math.log(0.85 / 0.90),
          1e6 * math.log(0.999 / 0.001))),
        Fam("benford-log", "half", 1e-4,
          (1 to 9).map(d => 1e6 * math.log10(1.0 + 1.0 / d))),
        Fam("wilson-lb", "half", 1e-4, wilson.toSeq),
        Fam("rolling-corr", "half", 1e-4, rollCorr.toSeq),
        Fam("jackknife-se", "half", 1e-4, jkSe),
        Fam("coreset-sims", "half", 1e-6, coresetSims.toSeq),
        // x_ndcg_eval: the K constant discount weights 1e6/log2(i+1)
        // (data-independent grid, audio-trig class)
        Fam("ndcg-weights", "half", 1e-4,
          (1 to RetrievalEval.TOPK).map(i =>
            1e6 / (math.log(i + 1.0) / math.log(2.0)))),
        // x_label_prop: every unlabeled×all kNN-grid cosine × 1e6 (the
        // bitext-grid bar — boundary approach shrinks with grid size)
        Fam("labelprop-grid", "half", 1e-8, labelPropGrid.toSeq),
        Fam("silhouette-grid", "half", 1e-8, silhouetteGrid.toSeq),
        Fam("silhouette-centroid", "half", 1e-6, silhouetteCentroid.toSeq),
        Fam("bm25", "half", 1e-6, bm25.toSeq),
        Fam("audio-trig-weights", "half", 1e-4, trig),
        Fam("maxsim", "half", 1e-6, maxsim.toSeq),
        Fam("mmr-relevance", "half", 1e-6, mmrRel.toSeq),
        Fam("mmr-pool-pairs", "half", 1e-6, mmrPairRaw.toSeq),
        Fam("rag-maxsim", "half", 1e-6, ragMs.toSeq),
        Fam("rag-pool-pairs", "half", 1e-6, ragPair.toSeq),
        Fam("entity-jw", "half", 1e-6, erJw.toSeq),
        // 125k grid cosines: the closest boundary approach shrinks with
        // n (measured 5.2e-7 at sf0.001) — still ~5·10³ above the
        // ~1e-10 libm threat at this magnitude, so the bar drops one
        // notch rather than pretending the family is as sparse as the
        // 20-value pools
        Fam("bitext-grid", "half", 1e-8, bitextRaw.toSeq),
        Fam("cosine-rank", "half", 1e-6, cosines.toSeq),
        Fam("q22-transcendental", "half", 1e-6, trans.toSeq),
        Fam("word-entropy", "half", 1e-6, entropy.toSeq),
        Fam("tfidf", "half", 1e-6, tfidf.toSeq),
        Fam("lm-nll", "half", 1e-6, nll.toSeq),
        Fam("dsir-weights", "half", 1e-4, dsir),
        Fam("temperature-pow", "half", 1e-4, tPow),
        Fam("temperature-threshold", "floor", 1e-4, tThr),
        Fam("full-curation-pow", "half", 1e-4, fPow),
        Fam("full-curation-threshold", "floor", 1e-4, fThr),
        Fam("mix-sample-threshold", "floor", 1e-4, mixThr),
        Fam("psi-weights", "half", 1e-4, psi),
        Fam("stream-psi-weights", "half", 1e-4, streamPsi),
        Fam("unigram-lp0", "half", 1e-4, lp0),
        Fam("unigram-lp1", "half", 1e-4, lp1)))
    }
  }
}
