package graft
import org.apache.spark.sql.functions._
import graft.llmops.{MinHashLSH, SetSim}

/** Scratch diagnosis of the round-8 x_setsim_join toy-SF slip
  * (0.27 s r7 → 0.77 s r8): isolate which of the two round-8 changes —
  * the PPJoin join-time filters vs the shared df-ordered base
  * restructure — costs the wall at sf0.1, timing each variant warm in
  * one JVM. Findings recorded in docs/SCALING.md.
  */
object SsSlip {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val dir = "/root/testdata/sf0.1"
    val sets = MinHashLSH.wordSetsBase(spark, dir)
    sets.count() // warm the shared shingle base out of every timing
    val ord = SetSim.orderedBase(spark, dir)
    ord.count() // warm the shared df-ordered base too

    def time(label: String, reps: Int = 3)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val l = scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)
      println(f"SSSLIP $label min=${ts.map(_._1).min}%5.2f s all=${
        ts.map(t => f"${t._1}%.2f").mkString(",")} rows=${ts.head._2} load=$l")
    }

    // the full contract query, as benched (warm bases)
    time("full query (as shipped)       ")(
      graft.llmops.SetSim.xSetSimJoin.build(spark, dir).count())
    // candidate join only: filters ON vs OFF from the same warm prefixes
    val pre = SetSim.prefixStream(sets, SetSim.T_NUM, SetSim.T_DEN).cache()
    pre.count()
    time("cand join, PPJoin filters ON  ")(
      SetSim.candidatePairs(pre, SetSim.T_NUM, SetSim.T_DEN).count())
    time("cand join, filters OFF        ")(
      SetSim.candidatePairs(pre, SetSim.T_NUM, SetSim.T_DEN,
        ppFilters = false).count())
    // full pipeline with filters off = the r7 shape (minus shared base)
    time("full, similarPairs (own pre)  ")(
      SetSim.similarPairs(sets, SetSim.T_NUM, SetSim.T_DEN).count())
    pre.unpersist()

    // isolate the prefix-stream derivation: from the CACHED array-of-
    // struct base vs recomputed from the element stream
    def prefixesFromOrd(o: org.apache.spark.sql.DataFrame) = o
      .select(col("doc_id"), size(col("ot")).cast("long").as("c"),
        posexplode(expr("""slice(transform(ot, x -> x.h), 1,
               size(ot) - ((3 * size(ot) + 4) div 5) + 1)""")))
      .select(col("doc_id"), col("col").as("h"),
        (col("pos") + lit(1)).cast("long").as("p"), col("c"))
    time("prefix stream from CACHED ord ")(prefixesFromOrd(ord).count())
    val el = sets.select(col("doc_id"), explode(col("hs")).as("h"))
    time("prefix stream recomputed      ")(
      prefixesFromOrd(SetSim.orderedSets(el)).count())
    time("cached ord raw read           ")(ord.count())

    // isolate the final orderBy: identical upstream, with/without sort
    val sp = SetSim.similarPairs(sets, SetSim.T_NUM, SetSim.T_DEN)
    time("similarPairs NO sort          ")(sp.count())
    time("similarPairs + orderBy        ")(
      sp.orderBy("doc_a", "doc_b").count())

    // the full pipeline A/B on pre source: cached ord vs recomputed
    def verifyPairs(cand: org.apache.spark.sql.DataFrame) = cand
      .join(sets.select(col("doc_id").as("a_id"), col("hs").as("ha"),
        col("c").as("ca")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("hs").as("hb"),
        col("c").as("cb")), "b_id")
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"),
        graft.functions.ArrayOps.sortedIntersectCount(col("ha"), col("hb"))
          .cast("long").as("inter"), col("ca"), col("cb"))
      .filter(lit(5) * col("inter") >= lit(3) * (col("ca") + col("cb") - col("inter")))
    val preCached = prefixesFromOrd(ord)
    val preFresh = prefixesFromOrd(SetSim.orderedSets(el))
    time("full from CACHED-ord pre      ")(
      verifyPairs(SetSim.candidatePairs(preCached, 3, 5)).count())
    time("full from recomputed pre      ")(
      verifyPairs(SetSim.candidatePairs(preFresh, 3, 5)).count())
    new java.io.PrintWriter("/tmp/ss_cached_plan.txt") {
      write(verifyPairs(SetSim.candidatePairs(preCached, 3, 5))
        .queryExecution.executedPlan.toString); close() }
    new java.io.PrintWriter("/tmp/ss_fresh_plan.txt") {
      write(verifyPairs(SetSim.candidatePairs(preFresh, 3, 5))
        .queryExecution.executedPlan.toString); close() }

    // the shipped query again, now fully warm — if this matches the
    // reconstruction, the opening measurement was charging JVM/codegen
    // warm-up to the query, not a plan defect
    time("full query (warm re-run)      ")(
      graft.llmops.SetSim.xSetSimJoin.build(spark, dir).count())
    new java.io.PrintWriter("/tmp/ss_shipped_plan.txt") {
      write(graft.llmops.SetSim.xSetSimJoin.build(spark, dir)
        .queryExecution.executedPlan.toString); close() }
    spark.stop()
  }
}
