package graft.entry

import graft.agg.{Inference, Integrity, TimeSeries}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistical-inference + pipeline-contract wave: Welch's t,
  * one-way ANOVA, categorical mutual information, the dbt-style
  * referential-integrity audit, day-of-week seasonal indices, and
  * inter-arrival SLA gap monitoring. Operators live in
  * [[graft.agg.Inference]], [[graft.agg.Integrity]] and
  * [[graft.agg.TimeSeries]]; every quantization/guard embeds
  * token-identically in the DuckDB twins.
  */
object InferQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Gap SLA: one hour in epoch micros (shared with the oracle). */
  private val SlaUs = 3600000000L
  /** Chi-square 95% critical value, 1 dof (shared literal). */
  private val SrmCrit = 3.841458820694124

  val queries: Map[String, Q] = Map(
    // Welch's unequal-variance t: en vs non-en document length — the
    // parametric location companion of q_rank_drift; one 1-row agg
    "q_welch_ttest" -> ((s, d) =>
      Inference.welchT(Tables.documents(s, d), col("n_chars"),
        col("lang") === "en")),

    // one-way ANOVA F of event value across event types — "does the
    // type factor explain variance at all?" before per-pair tests
    "q_anova_f" -> ((s, d) =>
      Inference.anovaF(Tables.events(s, d), col("event_type"),
        col("value"))),

    // mutual information + NMI of source × lang — the effect-size
    // companion of q_chi2_indep's significance test
    "q_mutual_info" -> ((s, d) =>
      Inference.mutualInfo(Tables.documents(s, d), col("source"),
        col("lang"))
        .withColumnsRenamed(Map("a" -> "source", "b" -> "lang"))),

    // referential-integrity audit across the star schema: FK orphans,
    // PK duplicates, null rates, domain predicates — one ok-gated row
    // per check
    "q_integrity_check" -> ((s, d) => Integrity.audit(Seq(
      Integrity.fkOrphans("fk_orders_customer", Tables.orders(s, d),
        col("o_custkey"), Tables.customer(s, d), col("c_custkey")),
      Integrity.fkOrphans("fk_lineitem_orders", Tables.lineitem(s, d),
        col("l_orderkey"), Tables.orders(s, d), col("o_orderkey")),
      Integrity.dupKeys("pk_documents_doc_id", Tables.documents(s, d),
        col("doc_id")),
      Integrity.nullCount("null_events_user", Tables.events(s, d),
        col("user_id")),
      Integrity.domainCheck("dom_orders_total_pos", Tables.orders(s, d),
        col("o_totalprice") > 0)))),

    // day-of-week seasonal index per event type — integer epoch-day
    // weekday math (no engine dayofweek(), whose numbering differs)
    "q_seasonality" -> ((s, d) =>
      TimeSeries.seasonality(Tables.events(s, d), col("event_type"),
        col("ts"))
        .withColumnsRenamed(Map("k" -> "event_type"))),

    // inter-arrival gap audit per event type with a 1-hour SLA — the
    // feed-stall monitor beside q_seasonality's volume profile
    "q_gaps" -> ((s, d) =>
      TimeSeries.gaps(Tables.events(s, d), col("event_type"), col("ts"),
        col("event_id"), SlaUs)
        .withColumnsRenamed(Map("k" -> "event_type"))),

    // sample-ratio mismatch on the user_id % 2 split — the gate every
    // A/B readout must pass before its metrics mean anything
    "q_ab_srm" -> ((s, d) =>
      Inference.srm(Tables.events(s, d), col("user_id"), 2, SrmCrit)),

    // CUPED variance-reduced variant means: pre-period per-user value
    // as the covariate, θ fit on all units from exact power sums
    "q_cuped" -> ((s, d) =>
      Inference.cuped(Tables.events(s, d), col("user_id"), col("ts"),
        col("value"))),

    // two-arm power analysis on the same user_id % 2 split: n per arm
    // to detect the observed effect at α=.05 / power=.8 — "is the
    // experiment big enough to know?" beside srm's split health
    "q_power_analysis" -> ((s, d) =>
      Inference.powerAnalysis(Tables.events(s, d), col("user_id"),
        col("value"), col("user_id") % 2 === 1)),

    // closed-form price model cents ~ quantity + discount points:
    // exact integer power sums, shared-text Cramer solve — the
    // regression a warehouse runs before reaching for an ML library
    "q_ols" -> ((s, d) =>
      Inference.ols2(Tables.lineitem(s, d),
        floor(col("l_extendedprice") * 100 + lit(0.5)),
        floor(col("l_quantity") + lit(0.5)),
        floor(col("l_discount") * 100 + lit(0.5)))),

    // 1-D Wasserstein (earth mover's) between purchase and
    // non-purchase value distributions — HOW FAR mass moved, beside
    // q_ks_drift's worst point and q_psi's reallocated fraction;
    // w1 in cents
    "q_emd_drift" -> ((s, d) =>
      graft.agg.RobustStats.wasserstein1(Tables.events(s, d),
        floor(col("value") * 100 + lit(0.5)),
        col("event_type") === "purchase")),

    // Pettitt rank changepoint per event type — the outlier-robust
    // companion of q_cusum's level-shift argmax; exp left to the
    // caller (stat_arg is the dimensionless exponent)
    "q_pettitt" -> ((s, d) =>
      TimeSeries.pettitt(Tables.events(s, d), col("event_type"),
        col("ts"), col("event_id"), col("value"))
        .withColumnsRenamed(Map("k" -> "event_type"))),

    // split-conformal 90% interval on the q_ols price model:
    // train (orderkey%5 ≥ 2) → calibration residual quantile
    // (orderkey%5 = 0) → held-out coverage (orderkey%5 = 1)
    "q_conformal" -> ((s, d) =>
      Inference.conformalInterval(Tables.lineitem(s, d),
        floor(col("l_extendedprice") * 100 + lit(0.5)),
        floor(col("l_quantity") + lit(0.5)),
        floor(col("l_discount") * 100 + lit(0.5)),
        col("l_orderkey") % 5 >= 2, col("l_orderkey") % 5 === 0))
  )

  // ======================================================================
  // DuckDB oracle twins — big sums in HUGEINT (Spark: DECIMAL(38,0)),
  // per-group double terms quantized to LONG before cross-group sums,
  // each emitted double ONE expression mirroring the Spark op order.
  // ======================================================================

  // Shared-text double operands mirroring Inference.ols2's Cramer
  // solve operand-for-operand (used by the q_ols and q_conformal
  // twins — the conformal fit must be the SAME solve on its slice).
  private object OlsSql {
    private def d(c: String) = s"CAST($c AS DOUBLE)"
    private val (n, sa, sb, sy) = (d("n"), d("sa"), d("sb"), d("sy"))
    private val (saa, sab, sbb) = (d("saa"), d("sab"), d("sbb"))
    private val (say, sby, syy) = (d("say"), d("sby"), d("syy"))
    val det = s"($n * ($saa * $sbb - $sab * $sab) - $sa * ($sa * $sbb - $sab * $sb) + $sb * ($sa * $sab - $saa * $sb))"
    val det0 = s"($sy * ($saa * $sbb - $sab * $sab) - $sa * ($say * $sbb - $sab * $sby) + $sb * ($say * $sab - $saa * $sby))"
    val det1 = s"($n * ($say * $sbb - $sab * $sby) - $sy * ($sa * $sbb - $sab * $sb) + $sb * ($sa * $sby - $say * $sb))"
    val det2 = s"($n * ($saa * $sby - $say * $sab) - $sa * ($sa * $sby - $say * $sb) + $sy * ($sa * $sab - $saa * $sb))"
    val (b0, b1, b2) = (s"($det0 / $det)", s"($det1 / $det)", s"($det2 / $det)")
    val sst = s"($syy - $sy * $sy / $n)"
    val sse = s"($syy - ($b0 * $sy + $b1 * $say + $b2 * $sby))"
    val bad = s"(n <= 2 OR $det = 0.0)"
    /** Quantized (y, a, b) projection of lineitem under `where`. */
    def slice(where: String): String =
      s"""SELECT
         |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y,
         |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS a,
         |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS b
         |  FROM lineitem
         |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
         |    AND l_discount IS NOT NULL$where""".stripMargin
    /** The ten exact power sums over a (y, a, b) relation `rel`. */
    def sums(rel: String): String =
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
         |        sum(CAST(y AS HUGEINT)) AS sy,
         |        sum(CAST(a * a AS HUGEINT)) AS saa,
         |        sum(CAST(a * b AS HUGEINT)) AS sab,
         |        sum(CAST(b * b AS HUGEINT)) AS sbb,
         |        sum(CAST(a * y AS HUGEINT)) AS say,
         |        sum(CAST(b * y AS HUGEINT)) AS sby,
         |        sum(CAST(y * y AS HUGEINT)) AS syy
         |      FROM $rel""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_ols" -> {
      import OlsSql._
      s"""WITH s AS (${slice("")}),
         |g AS (${sums("s")})
         |SELECT n,
         |  CASE WHEN $bad THEN NULL ELSE $b0 END AS b0,
         |  CASE WHEN $bad THEN NULL ELSE $b1 END AS b1,
         |  CASE WHEN $bad THEN NULL ELSE $b2 END AS b2,
         |  CASE WHEN $bad OR $sst <= 0.0 THEN NULL
         |       ELSE 1.0 - $sse / $sst END AS r2
         |FROM g""".stripMargin
    },

    // precondition (documented): a non-degenerate train fit — the
    // Spark operator's degenerate branch (NULL βs → NULL q̂) has no
    // twin here; InferenceSpec covers it engine-side
    "q_conformal" -> {
      import OlsSql._
      s"""WITH tr AS (${slice(" AND l_orderkey % 5 >= 2")}),
         |g AS (${sums("tr")}),
         |fit AS (SELECT n AS n_train, $b0 AS b0, $b1 AS b1, $b2 AS b2
         |        FROM g),
         |s AS (SELECT
         |        CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS yy,
         |        CAST(floor(l_quantity + 0.5) AS BIGINT) AS a,
         |        CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS b,
         |        CASE WHEN l_orderkey % 5 = 0 THEN 1 ELSE 0 END AS cal
         |      FROM lineitem
         |      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
         |        AND l_discount IS NOT NULL
         |        AND NOT l_orderkey % 5 >= 2),
         |r AS (SELECT cal,
         |        CAST(floor(abs(CAST(yy AS DOUBLE)
         |          - (f.b0 + f.b1 * CAST(a AS DOUBLE)
         |             + f.b2 * CAST(b AS DOUBLE))) * 1000000.0) AS BIGINT)
         |          AS rq
         |      FROM s CROSS JOIN fit f),
         |cc AS (SELECT rq, CAST(count(*) AS BIGINT) AS c FROM r
         |       WHERE cal = 1 GROUP BY 1),
         |t AS (SELECT CAST(sum(c) AS BIGINT) AS n_calib FROM cc),
         |cum AS (SELECT rq, CAST(sum(c) OVER (ORDER BY rq ROWS BETWEEN
         |          UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |        FROM cc),
         |q AS (SELECT min(rq) AS qhat_q FROM cum CROSS JOIN t
         |      WHERE cum * 10 >= least(
         |        (t.n_calib + 1) * 9 + 9 - ((t.n_calib + 1) * 9 + 9) % 10,
         |        t.n_calib * 10))
         |SELECT (SELECT n_train FROM fit) AS n_train,
         |  (SELECT n_calib FROM t) AS n_calib,
         |  CAST(sum(1 - cal) AS BIGINT) AS n_test,
         |  CAST((SELECT qhat_q FROM q) AS DOUBLE) / 1000000.0 AS qhat,
         |  CASE WHEN sum(1 - cal) = 0 OR (SELECT qhat_q FROM q) IS NULL
         |       THEN NULL
         |       ELSE CAST(sum(CASE WHEN cal = 0
         |              AND rq <= (SELECT qhat_q FROM q)
         |              THEN 1 ELSE 0 END) AS DOUBLE)
         |            / CAST(sum(1 - cal) AS DOUBLE) END AS coverage
         |FROM r""".stripMargin
    },

    "q_emd_drift" ->
      """WITH s AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
        |             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
        |               AS f
        |           FROM events WHERE value IS NOT NULL),
        |g AS (SELECT x, CAST(sum(f) AS BIGINT) AS a,
        |        CAST(sum(1 - f) AS BIGINT) AS b FROM s GROUP BY 1),
        |t AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
        |        CAST(sum(b) AS BIGINT) AS n2 FROM g),
        |c AS (SELECT x,
        |        CAST(sum(a) OVER w AS BIGINT) AS c1,
        |        CAST(sum(b) OVER w AS BIGINT) AS c2,
        |        lead(x) OVER (ORDER BY x) - x AS dx
        |      FROM g WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED
        |        PRECEDING AND CURRENT ROW)),
        |p AS (SELECT t.n1, t.n2,
        |        abs(CAST(c1 AS HUGEINT) * t.n2 -
        |            CAST(c2 AS HUGEINT) * t.n1) * dx AS term
        |      FROM c CROSS JOIN t WHERE dx IS NOT NULL)
        |SELECT n1, n2,
        |  CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
        |       ELSE CAST(sum(term) AS DOUBLE) /
        |            (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) END AS w1
        |FROM p GROUP BY n1, n2""".stripMargin,

    "q_pettitt" ->
      """WITH v AS (SELECT event_type AS k, epoch_us(ts) AS t,
        |             event_id AS id,
        |             CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |           FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |r AS (SELECT k, t, id,
        |        CAST(rank() OVER (PARTITION BY k ORDER BY c) AS BIGINT)
        |        - CAST(rank() OVER (PARTITION BY k ORDER BY c DESC)
        |            AS BIGINT) AS s
        |      FROM v),
        |u AS (SELECT k, t, id,
        |        CAST(row_number() OVER wt AS BIGINT) AS i,
        |        CAST(sum(s) OVER (PARTITION BY k ORDER BY t, id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS u,
        |        CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n
        |      FROM r WINDOW wt AS (PARTITION BY k ORDER BY t, id)),
        |f AS (SELECT *, row_number() OVER (PARTITION BY k
        |        ORDER BY abs(u) DESC, t, id) AS rk
        |      FROM u WHERE i < n)
        |SELECT k AS event_type, n, t AS cp_t, i AS cp_index,
        |  abs(u) AS u_stat,
        |  6.0 * CAST(u AS DOUBLE) * CAST(u AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |     + CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS stat_arg
        |FROM f WHERE rk = 1""".stripMargin,

    "q_welch_ttest" -> {
      val m1 = "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
      val m2 = "(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
      val v1 = "((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0))"
      val v2 = "((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0))"
      val se2 = s"($v1 / CAST(n1 AS DOUBLE) + $v2 / CAST(n2 AS DOUBLE))"
      s"""WITH s AS (SELECT n_chars AS x,
         |             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS f
         |           FROM documents WHERE n_chars IS NOT NULL),
         |a AS (SELECT CAST(sum(f) AS BIGINT) AS n1,
         |        CAST(sum(1 - f) AS BIGINT) AS n2,
         |        CAST(sum(f * x) AS BIGINT) AS s1,
         |        CAST(sum((1 - f) * x) AS BIGINT) AS s2,
         |        sum(CAST(f * x * x AS HUGEINT)) AS q1,
         |        sum(CAST((1 - f) * x * x AS HUGEINT)) AS q2
         |      FROM s)
         |SELECT n1, n2,
         |  CASE WHEN n1 = 0 THEN NULL ELSE $m1 END AS mean1,
         |  CASE WHEN n2 = 0 THEN NULL ELSE $m2 END AS mean2,
         |  CASE WHEN n1 <= 1 OR n2 <= 1 THEN NULL ELSE $v1 END AS var1,
         |  CASE WHEN n1 <= 1 OR n2 <= 1 THEN NULL ELSE $v2 END AS var2,
         |  CASE WHEN n1 <= 1 OR n2 <= 1 THEN NULL
         |       ELSE CASE WHEN $se2 <= 0.0 THEN NULL
         |            ELSE ($m1 - $m2) / sqrt($se2) END END AS t_stat,
         |  CASE WHEN n1 <= 1 OR n2 <= 1 THEN NULL
         |       ELSE CASE WHEN $se2 <= 0.0 THEN NULL
         |            ELSE $se2 * $se2 /
         |              (($v1 / CAST(n1 AS DOUBLE)) * ($v1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) +
         |               ($v2 / CAST(n2 AS DOUBLE)) * ($v2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0))
         |            END END AS df_welch
         |FROM a""".stripMargin
    },

    "q_anova_f" -> {
      val ssb = "((CAST(tqs AS DOUBLE) / 10000.0 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / 10000.0)"
      val ssw = "((CAST(q AS DOUBLE) - CAST(tqs AS DOUBLE) / 10000.0) / 10000.0)"
      s"""WITH v AS (SELECT event_type AS g,
         |             CAST(floor(value*100 + 0.5) AS BIGINT) AS c FROM events
         |           WHERE event_type IS NOT NULL AND value IS NOT NULL),
         |g AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g,
         |        CAST(sum(c) AS BIGINT) AS s_g,
         |        sum(CAST(c * c AS HUGEINT)) AS q_g FROM v GROUP BY 1),
         |q2 AS (SELECT *, (CAST(s_g AS HUGEINT) * s_g * 10000) // n_g
         |         AS tq FROM g),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS k,
         |        CAST(sum(n_g) AS BIGINT) AS n, CAST(sum(s_g) AS BIGINT) AS s,
         |        sum(q_g) AS q, sum(tq) AS tqs FROM q2)
         |SELECT k, n, $ssb AS ss_between, $ssw AS ss_within,
         |  CASE WHEN k <= 1 OR n <= k THEN NULL
         |       ELSE CASE WHEN $ssw <= 0.0 THEN NULL
         |            ELSE ($ssb / (CAST(k AS DOUBLE) - 1.0))
         |                 / ($ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
         |            END END AS f_stat
         |FROM t""".stripMargin
    },

    "q_mutual_info" -> {
      val mi = "CAST(sum(tq) OVER () AS DOUBLE) / 1.0E9"
      s"""WITH s AS (SELECT source AS a, lang AS b FROM documents
         |           WHERE source IS NOT NULL AND lang IS NOT NULL),
         |cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_obs
         |          FROM s GROUP BY 1, 2),
         |am AS (SELECT a, CAST(sum(n_obs) AS BIGINT) AS n_a
         |       FROM cells GROUP BY 1),
         |bm AS (SELECT b, CAST(sum(n_obs) AS BIGINT) AS n_b
         |       FROM cells GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS n_total FROM am),
         |ha AS (SELECT CAST(sum(CAST(floor(
         |           -(CAST(n_a AS DOUBLE) / CAST(n_total AS DOUBLE))
         |           * ln(CAST(n_a AS DOUBLE) / CAST(n_total AS DOUBLE))
         |           * 1.0E9) AS BIGINT)) AS BIGINT) AS haq
         |       FROM am CROSS JOIN tot),
         |hb AS (SELECT CAST(sum(CAST(floor(
         |           -(CAST(n_b AS DOUBLE) / CAST(n_total AS DOUBLE))
         |           * ln(CAST(n_b AS DOUBLE) / CAST(n_total AS DOUBLE))
         |           * 1.0E9) AS BIGINT)) AS BIGINT) AS hbq
         |       FROM bm CROSS JOIN tot),
         |wt AS (SELECT cells.a, cells.b, cells.n_obs, am.n_a, bm.n_b,
         |         tot.n_total, ha.haq, hb.hbq,
         |         CAST(floor((CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE))
         |           * ln(CAST(n_obs AS DOUBLE) * CAST(n_total AS DOUBLE)
         |               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
         |           * 1.0E9) AS BIGINT) AS tq
         |       FROM cells JOIN am USING (a) JOIN bm USING (b)
         |       CROSS JOIN tot CROSS JOIN ha CROSS JOIN hb)
         |SELECT a AS source, b AS lang, n_obs, n_a, n_b, n_total,
         |  CAST(tq AS DOUBLE) / 1.0E9 AS mi_term,
         |  $mi AS mi,
         |  CASE WHEN haq <= 0 OR hbq <= 0 THEN NULL
         |       ELSE ($mi) / sqrt((CAST(haq AS DOUBLE) / 1.0E9)
         |                         * (CAST(hbq AS DOUBLE) / 1.0E9)) END AS nmi
         |FROM wt""".stripMargin
    },

    "q_integrity_check" ->
      """SELECT 'fk_orders_customer' AS "check",
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders
        |   WHERE o_custkey IS NOT NULL AND o_custkey NOT IN
        |     (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL))
        |    AS n_violations,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_total,
        |  (SELECT count(*) FROM orders
        |   WHERE o_custkey IS NOT NULL AND o_custkey NOT IN
        |     (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)) = 0
        |    AS ok
        |UNION ALL
        |SELECT 'fk_lineitem_orders',
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |   WHERE l_orderkey IS NOT NULL AND l_orderkey NOT IN
        |     (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)),
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |  (SELECT count(*) FROM lineitem
        |   WHERE l_orderkey IS NOT NULL AND l_orderkey NOT IN
        |     (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)) = 0
        |UNION ALL
        |SELECT 'pk_documents_doc_id',
        |  (SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) FROM
        |     (SELECT count(*) AS c FROM documents GROUP BY doc_id)),
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents),
        |  (SELECT coalesce(sum(c - 1), 0) FROM
        |     (SELECT count(*) AS c FROM documents GROUP BY doc_id)) = 0
        |UNION ALL
        |SELECT 'null_events_user',
        |  (SELECT CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
        |     AS BIGINT) FROM events),
        |  (SELECT CAST(count(*) AS BIGINT) FROM events),
        |  (SELECT sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
        |     FROM events) = 0
        |UNION ALL
        |SELECT 'dom_orders_total_pos',
        |  (SELECT CAST(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END)
        |     AS BIGINT) FROM orders),
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders),
        |  (SELECT sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END)
        |     FROM orders) = 0""".stripMargin,

    "q_seasonality" ->
      """WITH daily AS (
        |  SELECT event_type AS k, epoch_us(ts) // 86400000000 AS d,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |b AS (SELECT k, (d + 4) % 7 AS dow,
        |        CAST(count(*) AS BIGINT) AS n_days,
        |        CAST(sum(c) AS BIGINT) AS n_events
        |      FROM daily GROUP BY 1, 2),
        |t AS (SELECT k, CAST(sum(n_days) AS BIGINT) AS nn,
        |        CAST(sum(n_events) AS BIGINT) AS ss FROM b GROUP BY 1)
        |SELECT b.k AS event_type, b.dow, b.n_days, b.n_events,
        |  CAST(b.n_events * t.nn AS DOUBLE)
        |    / CAST(b.n_days * t.ss AS DOUBLE) AS idx
        |FROM b JOIN t USING (k)""".stripMargin,

    "q_ab_srm" ->
      s"""WITH units AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS u
         |               FROM events WHERE user_id IS NOT NULL),
         |counts AS (SELECT u % 2 AS variant, CAST(count(*) AS BIGINT) AS n
         |           FROM units GROUP BY 1),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM counts),
         |q AS (SELECT variant, n, n_total,
         |        CAST(n_total AS DOUBLE) / 2.0 AS expected,
         |        CAST(floor((CAST(n AS DOUBLE) - CAST(n_total AS DOUBLE) / 2.0)
         |          * (CAST(n AS DOUBLE) - CAST(n_total AS DOUBLE) / 2.0)
         |          / (CAST(n_total AS DOUBLE) / 2.0) * 1.0E9) AS BIGINT) AS tq
         |      FROM counts CROSS JOIN t)
         |SELECT variant, n, n_total, expected,
         |  CAST(tq AS DOUBLE) / 1.0E9 AS chi2_term,
         |  CAST(sum(tq) OVER () AS DOUBLE) / 1.0E9 AS chi2,
         |  CAST(sum(tq) OVER () AS DOUBLE) / 1.0E9 > $SrmCrit AS srm
         |FROM q""".stripMargin,

    // mirrors Inference.powerAnalysis: cents power sums, the shared
    // (z_{.975}+z_{.8})² literal, one double expression per output
    "q_power_analysis" -> {
      val delta = "((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / 100.0)"
      val varP = "(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) + (CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))) / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE) - 2.0) / 10000.0)"
      val nReq = s"ceil(2.0 * ${graft.agg.Inference.PowerZSum2} * $varP / ($delta * $delta))"
      val bad = s"n0 <= 1 OR n1 <= 1"
      s"""WITH v AS (SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS arm,
         |             CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
         |           FROM events
         |           WHERE user_id IS NOT NULL AND value IS NOT NULL),
         |t AS (SELECT
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN arm = 1 THEN c END) AS BIGINT) AS s1,
         |    CAST(sum(CASE WHEN arm = 1 THEN CAST(c AS HUGEINT) * c END)
         |      AS DOUBLE) AS q1,
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         |    CAST(sum(CASE WHEN arm = 0 THEN c END) AS BIGINT) AS s0,
         |    CAST(sum(CASE WHEN arm = 0 THEN CAST(c AS HUGEINT) * c END)
         |      AS DOUBLE) AS q0
         |  FROM v)
         |SELECT n0, n1, $delta AS observed_delta,
         |  CASE WHEN $bad THEN NULL ELSE $varP END AS var_pooled,
         |  CASE WHEN $bad OR $delta = 0.0 OR $varP <= 0.0 THEN NULL
         |       ELSE CAST($nReq AS BIGINT) END AS n_required_per_arm,
         |  CASE WHEN $bad OR $delta = 0.0 OR $varP <= 0.0 THEN NULL
         |       ELSE CAST(least(n0, n1) AS DOUBLE) >= $nReq
         |       END AS powered_now
         |FROM t""".stripMargin
    },

    "q_cuped" -> {
      val varX = "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
      val theta = s"((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / $varX)"
      val meanX = "CAST(sxv AS DOUBLE) / CAST(n_v AS DOUBLE) / 100.0"
      val meanY = "CAST(syv AS DOUBLE) / CAST(n_v AS DOUBLE) / 100.0"
      s"""WITH v AS (SELECT CAST(user_id AS BIGINT) AS u,
         |             epoch_us(ts) // 86400000000 AS d,
         |             CAST(floor(value*100 + 0.5) AS BIGINT) AS c FROM events
         |           WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |             AND value IS NOT NULL),
         |span AS (SELECT (min(d) + max(d) + 1) // 2 AS mid FROM v),
         |per AS (SELECT u,
         |          CAST(sum(CASE WHEN d < mid THEN c ELSE 0 END) AS BIGINT)
         |            AS x,
         |          CAST(sum(CASE WHEN d >= mid THEN c ELSE 0 END) AS BIGINT)
         |            AS y,
         |          u % 2 AS variant
         |        FROM v CROSS JOIN span GROUP BY u),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |          CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |          sum(CAST(x * x AS HUGEINT)) AS sxx,
         |          sum(CAST(x * y AS HUGEINT)) AS sxy FROM per),
         |byv AS (SELECT variant, CAST(count(*) AS BIGINT) AS n_v,
         |          CAST(sum(x) AS BIGINT) AS sxv,
         |          CAST(sum(y) AS BIGINT) AS syv FROM per GROUP BY 1)
         |SELECT variant, n_v AS n, $meanX AS mean_x, $meanY AS mean_y,
         |  CASE WHEN $varX <= 0.0 THEN NULL ELSE $theta END AS theta,
         |  CASE WHEN $varX <= 0.0 THEN NULL
         |       ELSE $meanY - $theta * ($meanX
         |         - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0)
         |  END AS mean_y_adj
         |FROM byv CROSS JOIN tot""".stripMargin
    },

    "q_gaps" ->
      s"""WITH v AS (SELECT event_type AS k, epoch_us(ts) AS t, event_id AS id
         |           FROM events
         |           WHERE event_type IS NOT NULL AND ts IS NOT NULL),
         |g AS (SELECT k, t - lag(t) OVER (PARTITION BY k ORDER BY t, id)
         |        AS gap FROM v)
         |SELECT k AS event_type, CAST(count(gap) AS BIGINT) AS n_gaps,
         |  CAST(max(gap) AS BIGINT) AS max_gap_us,
         |  CAST(sum(CASE WHEN gap > $SlaUs THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_over_sla,
         |  CASE WHEN count(gap) = 0 THEN NULL
         |       ELSE CAST(sum(gap) AS DOUBLE) / CAST(count(gap) AS DOUBLE)
         |  END AS mean_gap_us
         |FROM g GROUP BY 1""".stripMargin
  )
}
