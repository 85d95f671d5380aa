package graft.ops

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}

/** Frequent-itemset / association-rule mining (the Apriori 2-itemset
  * layer) over the order–part basket data: which part pairs co-occur
  * in the same order more often than chance?
  *
  * Support counts ORDERS (distinct basket membership, the textbook
  * definition — a duplicated line item must not double-count);
  * confidence(a→b) = supp(ab)/supp(a) and
  * lift = supp(ab)·N / (supp(a)·supp(b)) ship as exact 1e6 integer
  * quotients — no floats anywhere.
  *
  * Scale posture: pair generation is the within-basket self-join (an
  * equi-join on the order key with an a<b residual — candidate volume
  * is Σ per-order item-count², bounded by basket size, never corpus²);
  * support is one hash agg on the pair key with map-side combine;
  * single-item supports are a second, smaller agg broadcast back; the
  * top-N head is TakeOrderedAndProject. minsup prunes before the rule
  * math, the Apriori property at the 2-itemset level.
  */
object Itemsets {

  /** Minimum pair support (orders containing both). */
  val MINSUP = 3L

  /** Rules emitted (top by support, pair-id tiebreak). */
  val TOPN = 50

  val xFreqItemsets = Q(
    "x_freq_itemsets",
    s"""WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
           FROM lineitem),
       n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM items),
       single AS (SELECT p, CAST(count(*) AS BIGINT) AS supp FROM items
                  GROUP BY 1),
       pair AS (SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS supp_ab
                FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
                GROUP BY 1, 2
                HAVING count(*) >= $MINSUP),
       top AS (SELECT * FROM pair ORDER BY supp_ab DESC, pa, pb LIMIT $TOPN)
       SELECT pa, pb, supp_ab, sa.supp AS supp_a, sb.supp AS supp_b,
              n.n_orders,
              (1000000 * supp_ab) // sa.supp AS conf_fix,
              (1000000 * supp_ab * n.n_orders) // (sa.supp * sb.supp) AS lift_fix
       FROM top JOIN single sa ON top.pa = sa.p
       JOIN single sb ON top.pb = sb.p, n
       ORDER BY supp_ab DESC, pa, pb""") { (s, dir) =>
    val items = T(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val n = items.agg(countDistinct(col("o")).as("n_orders"))
    val single = items.groupBy(col("p")).agg(count(lit(1)).as("supp"))
    // pairs are generated INSIDE each basket row (baskets are
    // small-bounded), replacing the oracle's self-join shuffle with one
    // basket agg + one pair agg. Measured parity with the join spelling
    // at sf0.1 (1.66 vs 1.71 s idle — floor-dominated); kept because the
    // shuffle carries one row per basket instead of one per item and the
    // pair blow-up happens after the exchange, which is the 100 TB shape
    val baskets = items.groupBy(col("o"))
      .agg(sort_array(collect_set(col("p"))).as("ps"))
    val pair = baskets
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
             transform(slice(ps, i + 2, size(ps)), y ->
               struct(x AS pa, y AS pb))))""")).as("e"))
      .groupBy(col("e.pa").as("pa"), col("e.pb").as("pb"))
      .agg(count(lit(1)).as("supp_ab"))
      .filter(col("supp_ab") >= MINSUP)
      .orderBy(col("supp_ab").desc, col("pa"), col("pb"))
      .limit(TOPN)
    pair
      .join(single.select(col("p").as("pa"), col("supp").as("supp_a")), "pa")
      .join(single.select(col("p").as("pb"), col("supp").as("supp_b")), "pb")
      .crossJoin(broadcast(n))
      .select(col("pa"), col("pb"), col("supp_ab"), col("supp_a"),
        col("supp_b"), col("n_orders"),
        expr("(1000000 * supp_ab) div supp_a").as("conf_fix"),
        expr("(1000000 * supp_ab * n_orders) div (supp_a * supp_b)")
          .as("lift_fix"))
      .orderBy(col("supp_ab").desc, col("pa"), col("pb"))
  }

  val all: Seq[Q] = Seq(xFreqItemsets)
}
