package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}

/** Distributed BPE (byte-pair-encoding) tokenizer training + application
  * — the tokenizer-construction step of an LLM data pipeline, expressed
  * in the classic scalable formulation: train on the WORD HISTOGRAM, not
  * the corpus.
  *
  * Scale posture: the corpus is touched exactly twice — once to build
  * the (word, count) histogram (one shuffle; the histogram is
  * vocabulary-sized, orders of magnitude smaller than a 100 TB corpus)
  * and once to apply the learned merges (pure map). Each training
  * iteration runs ONE distributed aggregation over the histogram
  * (adjacent-pair counts weighted by word frequency) and moves ONE row
  * (the argmax pair) to the driver; the merge table itself is
  * numMerges × 2 strings — broadcast state, like the k-means centroid
  * table. Lineage across iterations is kept flat by re-materializing the
  * (small) histogram per round.
  *
  * Determinism: pair argmax breaks ties on (count DESC, pair ASC), so
  * the learned merge sequence is a pure function of the corpus.
  *
  * The oracle is the derived-fact pattern (like the HLL within-5% and
  * IVF recall oracles): DuckDB cannot train a BPE tokenizer in SQL, so
  * the Spark side emits per-doc invariants it can check — token
  * concatenation must reconstruct the exact original text, the token
  * count can never exceed the character count, and the per-doc word
  * count (which DuckDB CAN compute) rides along as a hard cross-engine
  * column.
  */
object Bpe {

  /** One BPE merge step applied to a token sequence: every adjacent
    * (a, b) becomes the fused token a+b, left-to-right. Iterative — a
    * pathological unbroken "word" must not blow the stack.
    */
  def mergeOnce(toks: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var rest = toks
    while (rest.nonEmpty) {
      rest match {
        case x :: y :: tail if x == a && y == b =>
          out += (a + b); rest = tail
        case x :: tail =>
          out += x; rest = tail
        case Nil =>
      }
    }
    out.toList
  }

  /** Apply a learned merge sequence (in training order) to one word. */
  def applyMerges(word: String, merges: Seq[(String, String)]): List[String] = {
    var toks = word.map(_.toString).toList
    merges.foreach { case (a, b) =>
      if (toks.lengthCompare(1) > 0) toks = mergeOnce(toks, a, b)
    }
    toks
  }

  /** Train `numMerges` BPE merges on the word histogram of `textCol`.
    *
    * Two training paths over the same histogram, same learned merges:
    *   - histogram ≤ `driverHistMax` rows (≈4M words — covers normalized/
    *     tokenizer-ready corpora; raw web text with typo/URL vocabularies
    *     in the tens of millions overflows it deliberately, since those
    *     rows collect to GBs of driver heap): collect it once and run the
    *     merge loop locally. 24 distributed aggregation jobs over a
    *     vocabulary-sized table are pure job-scheduling floor; the
    *     corpus-sized work (histogram build, tokenizer apply) stays
    *     distributed either way.
    *   - histogram larger than that: the fully-distributed loop — one
    *     pair-count aggregation + 1-row argmax per merge round, over the
    *     CACHED histogram (the corpus is never re-scanned).
    */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int,
      driverHistMax: Int = 1 << 22): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the one corpus-wide pass: word histogram (vocabulary-sized) —
    // cached so the overflow probe and every distributed merge round read
    // the materialized histogram, never the corpus again
    val histDf: Dataset[(Long, String)] = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).count()
      .select(col("count"), col("w"))
      .as[(Long, String)]
      .cache()
    graft.core.CacheBin.swap("bpe.hist", histDf.toDF())
    // cardinality probe on the cached histogram first (one cheap job that
    // also materializes the cache): the old limit(+1).collect() probe
    // pulled a ~4M-row head onto the driver even when the answer was
    // "overflow, discard it" — exactly the corpora the cap exists for
    if (histDf.count() <= driverHistMax)
      return trainMergesLocal(
        histDf.collect().map { case (c, w) => (c, w.map(_.toString).toList) },
        numMerges)
    var hist: Dataset[(Long, List[String])] =
      histDf.map { case (c, w) => (c, w.map(_.toString).toList) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      round += 1
      // adjacent-pair counts weighted by word frequency — one shuffle
      // over the histogram, then a 1-row argmax to the driver
      val top = hist.flatMap { case (c, toks) =>
        toks.zip(toks.tail).map { case (a, b) => ((a, b), c) }
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), c) => (c, a, b) }
        .toDF("c", "a", "b")
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.nonEmpty && top(0).getLong(0) > 1) {
        val (a, b) = (top(0).getString(1), top(0).getString(2))
        merges += ((a, b))
        val prev = hist
        // apply the merge and RE-MATERIALIZE the (small) histogram so the
        // next round's plan doesn't stack numMerges map stages deep
        hist = prev.map { case (c, toks) => (c, mergeOnce(toks, a, b)) }
          .localCheckpoint(true)
      } else done = true // counts only shrink — further rounds are no-ops
    }
    merges.toSeq
  }

  /** UTF-8-byte lexicographic order — what Spark's `orderBy` uses for
    * string columns. The local path must tie-break identically or the two
    * paths could learn different merge sequences on non-BMP text (UTF-16
    * `String.compareTo` orders surrogate pairs differently).
    */
  private[llmops] val utf8Order: Ordering[String] = (x: String, y: String) => {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    var r = 0
    while (r == 0 && i < n) { r = (a(i) & 0xff) - (b(i) & 0xff); i += 1 }
    if (r != 0) r else a.length - b.length
  }

  /** Driver-side merge loop over a collected histogram — identical
    * semantics to the distributed loop (count-weighted adjacent pairs,
    * ties on count DESC then pair ASC in UTF-8 byte order, stop merging
    * at count ≤ 1).
    */
  private def trainMergesLocal(hist0: Array[(Long, List[String])],
      numMerges: Int): Seq[(String, String)] = {
    var hist = hist0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      round += 1
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      hist.foreach { case (c, toks) =>
        toks.zip(toks.tail).foreach { p =>
          pairs.update(p, pairs.getOrElse(p, 0L) + c)
        }
      }
      // max-count pair; a top count ≤ 1 can never recover (counts only
      // shrink once no pair repeats), so further rounds are no-ops
      implicit val ord: Ordering[String] = utf8Order
      val best = pairs.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c > 1 =>
          merges += ((a, b))
          hist = hist.map { case (c0, toks) => (c0, mergeOnce(toks, a, b)) }
        case _ => done = true
      }
    }
    merges.toSeq
  }

  /** X — end-to-end: train 24 merges on the corpus histogram, tokenize
    * every document, and emit the checkable facts. `n_words` is computed
    * independently by both engines; `reconstructs` / `tokens_le_chars`
    * are Spark-verified invariants of a correct tokenizer (a dropped or
    * duplicated token flips `reconstructs` red for that doc).
    */
  val xBpeTokenize = Q(
    "x_bpe_tokenize",
    """SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_words,
         TRUE AS reconstructs, TRUE AS tokens_le_chars
       FROM documents ORDER BY doc_id""") { (s, dir) =>
    import s.implicits._
    val docs = T(s, dir, "documents")
    val merges = trainMerges(docs, "text", 24)
    val bc = s.sparkContext.broadcast(merges)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val words = text.split(" ", -1).filter(_.nonEmpty)
        val toks = words.flatMap(w => applyMerges(w, bc.value))
        val rebuilt = {
          // re-tokenize word-by-word so reconstruction checks word joins
          val perWord = words.map(w => applyMerges(w, bc.value).mkString)
          perWord.mkString(" ")
        }
        val canon = words.mkString(" ")
        (id, words.length.toLong, rebuilt == canon,
          toks.length <= words.map(_.length).sum)
      }
      .toDF("doc_id", "n_words", "reconstructs", "tokens_le_chars")
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(xBpeTokenize)
}
