package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining at pair granularity — association rules over
  * (basket, item) co-occurrence, the market-basket primitive ("customers who
  * bought X also bought Y") and, over (document, shingle) baskets, the
  * co-occurrence backbone of collocation mining. Output per frequent
  * unordered pair: support, both single-item supports, directional
  * confidences, and lift, all in exact integer micro-units.
  *
  * Scale shape: the only quadratic step is the per-basket self-join, and it
  * runs AFTER the apriori prune — an item below `minSupport` cannot appear
  * in a frequent pair (support is anti-monotone), so infrequent items are
  * semi-joined out of the baskets first. On a heavy-tailed item catalog
  * that prune is the difference between pairing every basket's full
  * contents and pairing only the frequent head; the per-basket pair
  * fan-out is then bounded by (frequent items per basket)². Everything
  * else is map-side-combined aggregates and broadcastable joins (the
  * 1-row basket count, the frequent-item side).
  *
  * Integer discipline: all counts are positive, so Spark's `div` and
  * DuckDB's `//` agree. Confidence is `pair_n·unit div n_item` ≤ `unit`.
  * Lift is computed two-step — `(conf_ab · n_baskets) div n_b` — which
  * bounds every intermediate by `n_baskets·unit`, safe through ~9·10¹²
  * baskets at micro units (one-step `pair_n·n_baskets·unit` would wrap
  * three orders of magnitude earlier); the cost is one extra truncation,
  * identical on both engines by construction.
  */
object Itemsets {

  /** Baskets holding more than this many FREQUENT items are dropped whole:
    * one bot basket touching a 100k-item catalog would alone emit ~5·10⁹
    * pairs into the aggregate — per-basket fan-out is quadratic and AQE
    * cannot split a single basket's fan-out. The cap is a data-quality
    * stance, not just a guard: a basket that wide carries no co-purchase
    * signal. Mirrored in the DuckDB twin so the oracle cannot drift when
    * it fires; firing is logged.
    */
  val MaxBasketItems: Long = 1000L

  /** Frequent pairs with association stats over `baskets` (basket, item) —
    * rows are deduplicated here, so callers may pass raw multi-occurrence
    * data. Pairs and single items below `minSupport` are dropped; baskets
    * wider than `maxBasketItems` (counted AFTER the apriori prune) drop
    * whole, logged.
    */
  def pairRules(baskets: DataFrame, minSupport: Long, unit: Long = 1000000L,
                maxBasketItems: Long = MaxBasketItems): DataFrame = {
    require(minSupport >= 1, s"minSupport=$minSupport must be >= 1")
    require(unit >= 1, s"unit=$unit must be >= 1")
    require(maxBasketItems >= 2, s"maxBasketItems=$maxBasketItems must be >= 2")
    val b = baskets.select(col("basket"), col("item")).distinct().persist()
    val nB = b.select(count_distinct(col("basket")).as("n_baskets"))
    // apriori prune: support is anti-monotone, so only items that are
    // frequent alone can participate in a frequent pair
    val freq = b.groupBy("item").agg(count(lit(1)).as("n_item"))
      .filter(col("n_item") >= minSupport).persist()
    val fbAll = b.join(freq.select(col("item")), Seq("item"), "left_semi")
    val wide = fbAll.groupBy("basket").agg(count(lit(1)).as("n_in_basket"))
      .filter(col("n_in_basket") > maxBasketItems)
      .select(col("basket")).persist()
    val fb = fbAll.join(wide, Seq("basket"), "left_anti")
    // pair generation without the basket self-join: one aggregate collects
    // each basket's item set sorted, and an in-task HOF emits the ordered
    // pairs — the same O(width²) fan-out the join produced and the same
    // (item_a < item_b) pairs (sorted distinct items, i < j), minus the
    // join's second full exchange of fb and its persist barrier. Buffer
    // safety at scale: collect_list runs on the POST-guard frame, so
    // per-basket aggregation state is ≤ maxBasketItems items — the count
    // guard above stays constant-state exactly so this buffer stays bounded.
    val pairs = fb.groupBy("basket")
      .agg(sort_array(collect_list(col("item"))).as("items"))
      .select(explode(expr(
        "flatten(transform(items, (x, i) -> " +
          "transform(slice(items, i + 2, size(items) - i - 1), " +
          "y -> struct(x AS item_a, y AS item_b))))")).as("p"))
      .select(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minSupport)
    val result = pairs
      .join(freq.select(col("item").as("item_a"), col("n_item").as("n_a")), Seq("item_a"))
      .join(freq.select(col("item").as("item_b"), col("n_item").as("n_b")), Seq("item_b"))
      .crossJoin(broadcast(nB))
      .select(col("item_a"), col("item_b"), col("pair_n"), col("n_a"), col("n_b"),
        expr(s"pair_n * ${unit}L div n_a").as("conf_ab_micro"),
        expr(s"pair_n * ${unit}L div n_b").as("conf_ba_micro"),
        expr(s"(pair_n * ${unit}L div n_a) * n_baskets div n_b").as("lift_micro"))
      .persist()
    result.count()
    // guard log AFTER the result action (r14, VERDICT item 6): `wide` is
    // persisted and fully materialized by the anti-join inside
    // result.count(), so this count is a cache read — the old eager
    // wide.count() was a separate full pass over b→freq→fbAll that existed
    // only to order a log line before the work. 3 actions → 1 heavy +
    // 1 cache-local; the result set and the guard semantics are unchanged.
    val nWide = wide.count()
    if (nWide > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"pairRules: dropped $nWide baskets wider than maxBasketItems=" +
          s"$maxBasketItems frequent items (quadratic fan-out guard)")
    b.unpersist(blocking = false)
    freq.unpersist(blocking = false)
    wide.unpersist(blocking = false)
    result
  }

  /** DuckDB twin of [[pairRules]]: `basketsSql` selects (basket, item), raw
    * (the twin deduplicates like the operator). Same prune, same wide-basket
    * drop, same pair join, same two-step integer lift.
    */
  def duckPairRules(basketsSql: String, minSupport: Long, unit: Long = 1000000L,
                    maxBasketItems: Long = MaxBasketItems): String =
    s"""WITH b AS MATERIALIZED (SELECT DISTINCT basket, item FROM ($basketsSql) AS b0),
       nb AS (SELECT count(DISTINCT basket) AS n_baskets FROM b),
       freq AS MATERIALIZED (SELECT item, count(*) AS n_item FROM b
                             GROUP BY item HAVING count(*) >= $minSupport),
       fb0 AS MATERIALIZED (SELECT basket, item FROM b
                            WHERE item IN (SELECT item FROM freq)),
       wide AS (SELECT basket FROM fb0 GROUP BY basket
                HAVING count(*) > $maxBasketItems),
       -- NOT EXISTS, not NOT IN: a NULL basket in the wide set would make
       -- NOT IN three-valued-NULL every row (empty twin) where Spark's
       -- left_anti drops only the matching baskets
       fb AS MATERIALIZED (SELECT basket, item FROM fb0
                           WHERE NOT EXISTS (SELECT 1 FROM wide w
                                             WHERE w.basket = fb0.basket)),
       p AS (SELECT x.item AS item_a, y.item AS item_b, count(*) AS pair_n
             FROM fb x JOIN fb y ON x.basket = y.basket AND x.item < y.item
             GROUP BY 1, 2 HAVING count(*) >= $minSupport)
       SELECT item_a, item_b, CAST(pair_n AS BIGINT) AS pair_n,
              CAST(fa.n_item AS BIGINT) AS n_a, CAST(fb2.n_item AS BIGINT) AS n_b,
              CAST(pair_n * $unit // fa.n_item AS BIGINT) AS conf_ab_micro,
              CAST(pair_n * $unit // fb2.n_item AS BIGINT) AS conf_ba_micro,
              CAST((pair_n * $unit // fa.n_item) * nb.n_baskets // fb2.n_item AS BIGINT) AS lift_micro
       FROM p JOIN freq fa ON fa.item = p.item_a
              JOIN freq fb2 ON fb2.item = p.item_b
              CROSS JOIN nb"""
}
