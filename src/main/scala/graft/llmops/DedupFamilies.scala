package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}

/** Near-duplicate FAMILY clustering: connected components over the
  * verified LSH near-dup pairs, labeling every document with the minimum
  * doc_id of its component ("family") and flagging the survivor. This is
  * the step that turns pairwise near-dup detection into an actionable
  * dedup decision (keep one doc per family) in a training-data pipeline.
  *
  * Scale posture: label propagation runs ONLY over the pair-induced
  * subgraph (near-dup families are tiny and sparse — the edge set is
  * orders of magnitude smaller than the corpus); untouched documents are
  * their own family via a left join at the end, never iterated. Each
  * iteration is one small join + one agg; iteration count is bounded by
  * the component diameter (near-dup families are cliques or short chains,
  * so 2-3 rounds in practice, hard-capped at 20).
  */
object DedupFamilies {

  /** Library form: connected-component labels for an undirected pair
    * list (a_id, b_id) — returns (id, label) for every id that appears
    * in a pair, label = component minimum. Min-label propagation with
    * pointer jumping (each round also hops id -> label -> label's label),
    * so convergence is O(log diameter) rounds instead of O(diameter).
    *
    * Convergence is detected WITHOUT an extra join: labels are monotone
    * non-increasing under min-propagation, so the label sum is a strictly
    * decreasing fixpoint metric — equal sums across a round means no label
    * moved. The sum is one cheap agg over the round's already-materialized
    * (checkpointed) frame, vs. the previous implementation's
    * join-with-old + count() job pair per round.
    */
  def components(pairs: DataFrame): DataFrame =
    components(pairs, driverThreshold = 1 << 20)

  /** `driverThreshold`: edge lists at or below this size are solved with
    * an in-memory union-find on the driver (path compression, min-root
    * labels — identical output to the distributed loop) instead of N
    * rounds of Spark jobs. Near-dup edge sets are tiny relative to the
    * corpus — a 1M-edge graph is ~16 MB of driver state, bounded by the
    * explicit threshold the same way the k-means centroid table is —
    * while each distributed label-propagation round costs whole-cluster
    * job latency. Above the threshold the pointer-jumping loop below
    * takes over automatically; correctness never depends on which path
    * ran.
    */
  def components(pairs: DataFrame, driverThreshold: Long): DataFrame = {
    // both paths assume integral ids (the driver map is keyed by Long;
    // the distributed convergence metric sums labels) — fail fast with a
    // clear message instead of a deep ClassCastException
    pairs.schema.take(2).foreach { f =>
      require(Seq("byte", "short", "integer", "long")
        .contains(f.dataType.typeName),
        s"components: id column '${f.name}' must be integral, got ${f.dataType}")
    }
    // cached: the count decides the path, then either the local iteration
    // (driver) or the propagation loop (distributed) re-reads the edges;
    // the bin keeps one generation alive across repeated invocations
    val edges = pairs.toDF("a_id", "b_id")
      .select(col("a_id").cast("long"), col("b_id").cast("long"))
      .cache()
    graft.core.CacheBin.swap("components.edges", edges)
    val spark = edges.sparkSession
    val nEdges = edges.count()
    if (nEdges <= driverThreshold) {
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      // toLocalIterator: one partition of Row objects resident at a time —
      // driver state stays the LongMap (~16 MB at the 1M-edge threshold),
      // not a full Array[Row] of the edge list
      edges.toLocalIterator().forEachRemaining { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // min root wins -> labels are component minima
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val labels = parent.keys.toSeq.sorted.map(id => (id, find(id)))
      import spark.implicits._
      return labels.toDF("id", "label")
    }
    val bidir = edges.union(edges.select(col("b_id"), col("a_id")))
      .toDF("src", "dst").cache()
    // localCheckpoint (eager) per round truncates lineage — without it the
    // loop's plan grows by the whole previous plan every iteration and
    // Catalyst re-analyzes an exponentially nested tree (21k-line plans by
    // round 3 on the fixture; unbounded on deeper graphs). At cluster
    // scale with failure tolerance, use reliable checkpoint() instead.
    // the convergence metric rides the checkpoint job as an observed
    // metric (CollectMetrics) — ONE Spark job per round, not a
    // checkpoint + separate agg pair. Sum over DECIMAL(38,0) so the
    // metric can never overflow, whatever the id domain (ANSI mode
    // throws on Long overflow).
    def checkpointWithSum(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
      val obs = org.apache.spark.sql.Observation()
      val out = df
        .observe(obs, sum(col("label").cast("decimal(38,0)")).as("s"))
        .localCheckpoint()
      (out, obs.get("s").asInstanceOf[java.math.BigDecimal])
    }
    var (labels, prevSum) = checkpointWithSum(
      bidir.select(col("src").as("id"))
        .distinct().withColumn("label", col("id")))
    var converged = false
    var iter = 0
    val maxIter = 50
    while (!converged && iter < maxIter) {
      // pointer jump rides the SAME join as neighbor propagation: the
      // label links (label(i) -> i) are just extra edges, and min-label
      // propagation along them assigns i label(label(i)) — chain lengths
      // halve per round with one join instead of a second self-join
      val linkEdges = labels
        .select(col("label").as("src"), col("id").as("dst"))
      val prop = bidir.union(linkEdges)
        .join(labels, col("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
      val (next, s) = checkpointWithSum(
        labels.union(prop)
          .groupBy(col("id")).agg(min(col("label")).as("label")))
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      iter += 1
    }
    // never return silently-wrong labels: a graph needing > maxIter rounds
    // would exit the loop unconverged. Fail loudly — with pointer jumping
    // 50 rounds covers diameters up to ~2^50, so this only fires on a bug.
    if (!converged)
      throw new IllegalStateException(
        s"components: label propagation not converged after $maxIter rounds " +
          "— component diameter exceeds the cap")
    // the loop fully consumed the bidirectional edge cache; labels is
    // checkpointed (edges stays in the bin for the next invocation)
    bidir.unpersist(false)
    labels
  }

  /** Exact-verified near-dup pairs over the shared word-3-gram set base
    * (one cached shingle pass per dir feeds q33 and both family queries).
    */
  private def verifiedPairs(
      s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val sets = MinHashLSH.wordSetsBase(s, dir)
    val cand = MinHashLSH.candidates(
      MinHashLSH.bandKeys(MinHashLSH.signaturesFromSets(sets)))
    MinHashLSH.exactJaccardFromSets(cand, sets)
      .filter(col("jaccard") >= MinHashLSH.TAU)
      .select(col("a_id"), col("b_id"))
  }

  val xFamilies = Q(
    "x_dedup_families",
    s"""WITH RECURSIVE
       words AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
              FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-2, 1))) AS i)
              WHERE len(t) >= 3),
       card AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       inter AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS i
                 FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
                 GROUP BY 1, 2),
       pairs AS (SELECT a_id, b_id FROM inter
                 JOIN card ca ON ca.doc_id = a_id
                 JOIN card cb ON cb.doc_id = b_id
                 WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= ${MinHashLSH.TAU}),
       edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
                 UNION ALL SELECT b_id, a_id FROM pairs),
       r(id, label) AS (SELECT src, src FROM edges
                        UNION
                        SELECT e.dst, r.label FROM edges e JOIN r ON e.src = r.id),
       fam AS (SELECT id, min(label) AS family FROM r GROUP BY id)
       SELECT d.doc_id, coalesce(f.family, d.doc_id) AS family,
              d.doc_id = coalesce(f.family, d.doc_id) AS is_survivor
       FROM documents d LEFT JOIN fam f ON f.id = d.doc_id
       ORDER BY d.doc_id""") { (s, dir) =>
    val docs = T(s, dir, "documents").select(col("doc_id"))
    val labels = components(verifiedPairs(s, dir))
    docs.join(labels, docs("doc_id") === labels("id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("family"))
      .withColumn("is_survivor", col("doc_id") === col("family"))
      .orderBy("doc_id")
  }

  /** X — dedup SURVIVOR selection: the step that actually emits the KEPT
    * corpus. Families are the same verified-pair connected components as
    * x_dedup_families; within each family the kept document is the
    * longest one (max n_chars, doc_id tiebreak) — "keep the most complete
    * near-duplicate", the survivor policy for truncation/suffix variants —
    * and the rest are dropped. Downstream training jobs read THIS output,
    * not the pair/label diagnostics.
    *
    * Scale: the argmax window runs ONLY over the pair-induced subgraph
    * (near-dup families are a sliver of the corpus); untouched documents
    * are appended by an anti-join pass-through and are never windowed —
    * no corpus-wide shuffle on `family`.
    */
  val xSurvivors = Q(
    "x_dedup_survivors",
    s"""WITH RECURSIVE
       words AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
              FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-2, 1))) AS i)
              WHERE len(t) >= 3),
       card AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       inter AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS i
                 FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
                 GROUP BY 1, 2),
       pairs AS (SELECT a_id, b_id FROM inter
                 JOIN card ca ON ca.doc_id = a_id
                 JOIN card cb ON cb.doc_id = b_id
                 WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= ${MinHashLSH.TAU}),
       edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
                 UNION ALL SELECT b_id, a_id FROM pairs),
       r(id, label) AS (SELECT src, src FROM edges
                        UNION
                        SELECT e.dst, r.label FROM edges e JOIN r ON e.src = r.id),
       fam AS (SELECT id, min(label) AS family FROM r GROUP BY id),
       labeled AS (SELECT d.doc_id, coalesce(f.family, d.doc_id) AS family,
                          d.n_chars
                   FROM documents d LEFT JOIN fam f ON f.id = d.doc_id),
       ranked AS (SELECT doc_id, family, n_chars,
                         row_number() OVER (PARTITION BY family
                                            ORDER BY n_chars DESC, doc_id) AS rn
                  FROM labeled)
       SELECT doc_id, family, n_chars FROM ranked WHERE rn = 1
       ORDER BY doc_id""") { (s, dir) =>
    val docs = T(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    val labels = components(verifiedPairs(s, dir))
    val inFamily = docs.join(labels, docs("doc_id") === labels("id"))
      .select(col("doc_id"), col("label").as("family"), col("n_chars"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("family"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val kept = inFamily
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
    val untouched = docs
      .join(labels, docs("doc_id") === labels("id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("family"), col("n_chars"))
    kept.unionByName(untouched).orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(xFamilies, xSurvivors)
}
