package graft.entry

import graft.join.Joins
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-family driver queries. Physical posture: dimension chains are
  * broadcast (no fact shuffle), the large lineitem⋈orders join is left to
  * Catalyst+AQE (sort-merge/shuffled-hash with runtime skew split), the
  * as-of join is the union+window composition (one shuffle).
  */
object JoinQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_join_enrich" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      Joins.enrich(Joins.enrich(Joins.enrich(
        o, c, col("o_custkey") === col("c_custkey")),
        n, col("c_nationkey") === col("n_nationkey")),
        r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
    }),

    "q_join_large" -> ((s, d) =>
      Joins.largeJoin(Tables.lineitem(s, d),
        Tables.orders(s, d).withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"))),

    // q_join_large's layout-optimized twin: both fact sides materialized
    // ONCE as hash-bucketed tables on the join key (the write-time
    // shuffle), then every join on that key reads co-located buckets —
    // ZERO exchanges under the join (PlanSpec-pinned). The merge hint
    // declares the 100 TB plan (two huge sides) that AQE would replace
    // with a broadcast at toy scale; the filter proves pushdown survives
    // the bucketed scan.
    "q_bucketed_join" -> ((s, d) => {
      val fp = graft.sources.Bucketing.dirFingerprint(d)
      val li = graft.sources.Bucketing.bucketed(
        Tables.lineitem(s, d), "li_bkt", fp, "l_orderkey", 8,
        Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount"))
      val or = graft.sources.Bucketing.bucketed(
        Tables.orders(s, d), "ord_bkt", fp, "o_orderkey", 8,
        Seq("o_orderkey", "o_orderpriority"))
      li.filter(col("l_quantity") > 25).hint("merge")
        .join(or, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"))
    }),

    "q_semi_join" -> ((s, d) =>
      Joins.semi(Tables.part(s, d),
        Tables.lineitem(s, d).filter(col("l_quantity") > 45),
        col("p_partkey") === col("l_partkey"))
        .select("p_partkey", "p_name")),

    "q_anti_join" -> ((s, d) =>
      Joins.anti(Tables.customer(s, d), Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"))
        .select("c_custkey", "c_name")),

    "q_outer_join" -> ((s, d) =>
      Joins.valueJoin(Tables.customer(s, d), Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left_outer",
        Seq(col("c_custkey"), col("o_orderkey")))
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))),

    "q_asof_join" -> ((s, d) => asofFixed(s, d)),

    // skew join: user_id deliberately collapsed to 5 hot keys (each key
    // holds ~20% of the fact table — the shape AQE's skew split cannot
    // always save, e.g. under a non-shuffle parent). saltedJoin spreads
    // each hot key over `salt` reducers via (key, salt) composite keys;
    // salting is semantics-free so the oracle is the PLAIN join.
    "q_skew_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), pmod(col("user_id"), lit(5)).cast("long").as("hk"))
      val dim = Tables.nation(s, d)
        .groupBy(pmod(col("n_nationkey"), lit(5)).cast("long").as("hk"))
        .agg(count(lit(1)).as("n_dim"))
      Joins.saltedJoin(ev, dim, Seq("hk"), salt = 8)
        .select(col("event_id"), col("hk"), col("n_dim"))
    }),

    // range join: click→purchase attribution — for every purchase, the
    // clicks by the same user in the preceding hour (equi on user, range
    // on ts). One key shuffle; the range is a post-join filter.
    "q_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
      Joins.rangeJoin(purchases, clicks, Seq("user_id"),
        rightOrd = col("cts"),
        low = col("pts") - expr("INTERVAL 1 HOUR"), high = col("pts"),
        joinType = "left_outer")
        .groupBy(purchases("user_id"), col("purchase_id"))
        .agg(count(col("click_id")).as("n_clicks"))
        .select(col("user_id"), col("purchase_id"), col("n_clicks"))
    }),

    // record-linkage blocking join over the CANONICALIZED name
    // dictionary (distinct names, min-partkey representative — the
    // dictionary, not the row instances, is what entity resolution
    // matches; it's also what keeps the pair space tiny as rows grow):
    // candidates share the last name token (the noun), only blocked
    // pairs pay the levenshtein refine (dist ≤ 2) — never the naive
    // |names|² matrix
    "q_fuzzy_join" -> ((s, d) => Joins.blockedFuzzyJoin(
      Tables.part(s, d).groupBy(col("p_name"))
        .agg(min(col("p_partkey")).as("rep_id")),
      col("rep_id"), col("p_name"),
      element_at(split(col("p_name"), " ", -1), -1),
      maxDist = 2))
  )

  // asOf needs a shared key column name on both sides; wrap:
  private def asofFixed(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_id"), col("user_id").as("uk"), col("ts"))
    val or = Tables.orders(s, d).select(col("o_custkey").as("uk"), col("o_orderkey"),
      col("o_totalprice"), col("o_orderdate"))
    Joins.asOf(ev, col("ts"), or, col("o_orderdate"),
      keys = Seq("uk"), payload = Seq("o_orderkey", "o_totalprice"),
      rightTieBreak = col("o_orderkey"))
      .select(col("event_id"), col("uk").as("user_id"), col("o_orderkey"), col("o_totalprice"))
  }

  val oracle: Map[String, String] = Map(
    "q_join_enrich" ->
      """SELECT r_name, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q_join_large" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    // bucketing is a physical layout — the logical result is the plain
    // filtered join, which is exactly what the oracle states
    "q_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_quantity > 25
        |GROUP BY o_orderpriority""".stripMargin,

    "q_semi_join" ->
      "SELECT p_partkey, p_name FROM part WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 45)",

    "q_anti_join" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",

    "q_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,

    "q_skew_join" ->
      """SELECT e.event_id, e.hk, n.n_dim
        |FROM (SELECT event_id, user_id % 5 AS hk FROM events) e
        |JOIN (SELECT n_nationkey % 5 AS hk, count(*) AS n_dim
        |      FROM nation GROUP BY 1) n USING (hk)""".stripMargin,

    "q_range_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id, count(c.event_id) AS n_clicks
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id
        | AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
        |GROUP BY p.user_id, p.event_id""".stripMargin,

    "q_asof_join" ->
      """SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
        |FROM events e
        |LEFT JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) o ON true""".stripMargin,

    // identical blocking key (noun|first-char) and the same classic
    // levenshtein metric — the oracle verifies the blocked candidate set
    "q_fuzzy_join" ->
      """WITH p AS (
        |  SELECT min(p_partkey) AS id, p_name AS name,
        |         string_split(p_name, ' ')[-1] AS blk
        |  FROM part GROUP BY p_name)
        |SELECT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b,
        |       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |FROM p a JOIN p b ON a.blk = b.blk AND a.id < b.id
        |WHERE levenshtein(a.name, b.name) <= 2""".stripMargin
  )
}
