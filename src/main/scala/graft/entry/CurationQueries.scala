package graft.entry

import graft.llm.{Dedup, Linkage, Privacy, Selection, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 curation wave: Fellegi–Sunter record linkage, ε-DP noisy
  * count release, DoReMi-style one-step domain reweighting, Unicode-
  * script profiling, and the LSH banding planner. Operators live in
  * [[graft.llm.Linkage]], [[graft.llm.Privacy]], [[graft.llm.Selection]],
  * [[graft.llm.TextAnalysis]] and [[graft.llm.Dedup]]; every constant
  * below embeds token-identically in the DuckDB twins.
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Fellegi–Sunter knobs: fixed match prior, top-K pairs. */
  private val FsM = 0.9; private val FsTopK = 50
  /** DP-release knobs: epsilon and the deterministic noise salt. */
  private val DpEps = 0.5; private val DpSalt = 3
  /** DoReMi step size. */
  private val DrEta = 1.0
  /** LSH planner configurations (b, r) — powers of two only (the
    * exact-squaring contract of [[Dedup.lshPlan]]). */
  private val LshConfigs = Seq((4, 4), (8, 4), (16, 4), (8, 8), (16, 2))
  private val LshGridN = 19

  val queries: Map[String, Q] = Map(
    // Fellegi–Sunter candidate scoring over nation-blocked customer
    // pairs: u-rates estimated from the candidates, quantized log2
    // weights, top-50 by summed weight
    "q_fs_linkage" -> ((s, d) =>
      Linkage.fellegiSunter(Tables.customer(s, d), col("c_custkey"),
        Seq("nation" -> col("c_nationkey")),
        Seq("segment" -> col("c_mktsegment"),
          "acct_k" -> floor(col("c_acctbal") / lit(1000.0)),
          "name2" -> substring(col("c_name"), -2, 2)),
        FsM, FsTopK)),

    // ε-DP per-source count release with deterministic hash-Laplace
    // noise — one map-combined groupBy + a |groups|-row projection
    "q_dp_release" -> ((s, d) =>
      Privacy.dpRelease(Tables.documents(s, d), col("source"), DpEps,
        DpSalt)),

    // one-step DoReMi domain reweighting: mixture shares scaled by
    // exp(eta x excess proxy loss), proxy = negated classifier margin
    "q_domain_reweight" -> ((s, d) =>
      Selection.domainReweight(Tables.documents(s, d), col("source"),
        -Selection.clfMargin(col("text")), DrEta)),

    // Unicode-script character mix per source — the label-vs-script
    // drift monitor; six fused regexp strips + one groupBy
    "q_script_profile" -> ((s, d) =>
      TextAnalysis.scriptProfile(Tables.documents(s, d), col("source"),
        col("text"))),

    // LSH banding S-curves for the candidate configs — pure generated
    // math (exact squaring/sqrt chains, never libm pow)
    "q_lsh_plan" -> ((s, d) => Dedup.lshPlan(s, LshConfigs, LshGridN))
  )

  // ======================================================================
  // DuckDB oracle twins
  // ======================================================================

  private val SqlToks =
    "list_filter(string_split(text, ' '), t -> len(t) > 0)"
  private def sqlMd5Long(x: String): String =
    s"CAST('0x'||substring(md5($x),1,15) AS BIGINT)"

  /** Exact x^n as the exponentiation-by-squaring multiplication chain —
    * textually mirrors [[Dedup.lshPlan]]'s powChain (libm pow is only
    * within-1-ulp and may differ across engines). */
  private def powSql(x: String, n: Int): String =
    if (n == 1) x else { val h = powSql(x, n / 2); s"($h * $h)" }
  private def sqrtSql(x: String, r: Int): String =
    if (r == 1) x else sqrtSql(s"sqrt($x)", r / 2)

  /** Per-field FS weight terms (shared clamp + log2 chains). */
  private def fsWeightSql(f: String): String = {
    val u = s"least(greatest(CAST(na_$f AS DOUBLE) / CAST(n AS DOUBLE), " +
      "1e-9), (1.0 - 1e-9))"
    s"""CASE WHEN agree_$f
       |  THEN CAST(floor(ln(0.9 / $u) / ln(2.0) * 1000000.0) AS BIGINT)
       |  ELSE CAST(floor(ln((1.0 - 0.9) / (1.0 - $u)) / ln(2.0)
       |       * 1000000.0) AS BIGINT) END""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_fs_linkage" -> {
      val fields = Seq("segment", "acct_k", "name2")
      s"""WITH c AS (
         |  SELECT c_custkey AS rid, c_nationkey AS nation,
         |         c_mktsegment AS segment,
         |         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS acct_k,
         |         right(c_name, 2) AS name2
         |  FROM customer),
         |p AS (
         |  SELECT a.rid AS id1, b.rid AS id2,
         |    (a.segment IS NOT DISTINCT FROM b.segment) AS agree_segment,
         |    (a.acct_k IS NOT DISTINCT FROM b.acct_k) AS agree_acct_k,
         |    (a.name2 IS NOT DISTINCT FROM b.name2) AS agree_name2
         |  FROM c a JOIN c b ON a.nation = b.nation AND a.rid < b.rid),
         |u AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    ${fields.map(f => s"CAST(sum(CASE WHEN agree_$f THEN 1 ELSE 0 END) AS BIGINT) AS na_$f").mkString(",\n         |    ")}
         |  FROM p),
         |q AS (
         |  SELECT id1, id2, agree_segment, agree_acct_k, agree_name2,
         |    ${fields.map(f => s"(CASE WHEN agree_$f THEN 1 ELSE 0 END)").mkString(" + ")} AS n_agree,
         |    ${fields.map(f => "(" + fsWeightSql(f).replace("\n", "\n         |    ") + ")").mkString("\n         |    + ")} AS sq
         |  FROM p CROSS JOIN u)
         |SELECT id1, id2, agree_segment, agree_acct_k, agree_name2,
         |  CAST(n_agree AS BIGINT) AS n_agree,
         |  CAST(sq AS DOUBLE) / 1000000.0 AS score
         |FROM q ORDER BY sq DESC, id1, id2 LIMIT $FsTopK""".stripMargin
    },

    "q_dp_release" ->
      s"""WITH g AS (SELECT source AS g, CAST(count(*) AS BIGINT) AS n
         |           FROM documents GROUP BY 1),
         |r AS (SELECT g, n,
         |        (CAST(${sqlMd5Long(s"'$DpSalt|' || coalesce(CAST(g AS VARCHAR), ' null')")}
         |          % 1000000 AS DOUBLE) + 0.5) / 1000000.0 AS p
         |      FROM g)
         |SELECT g,
         |  CAST(greatest(floor(CAST(n AS DOUBLE) +
         |    (-1.0 / $DpEps) * sign(p - 0.5) *
         |    ln(1.0 - 2.0 * abs(p - 0.5))), 0.0) AS BIGINT) AS n_released,
         |  CAST($DpEps AS DOUBLE) AS epsilon
         |FROM r""".stripMargin,

    "q_domain_reweight" ->
      s"""WITH toks AS (SELECT source, $SqlToks AS tk FROM documents),
         |m AS (
         |  SELECT source AS g,
         |    CASE WHEN tk IS NULL THEN NULL
         |      ELSE -CAST(coalesce(list_sum(list_transform(tk, t ->
         |        ((${sqlMd5Long("t")} % 64) * 2654435761) % 2001 - 1000)), 0)
         |        AS BIGINT) END AS lq
         |  FROM toks),
         |per AS (SELECT g, CAST(count(*) AS BIGINT) AS n_docs,
         |          sum(CAST(lq AS HUGEINT)) AS sl
         |        FROM m WHERE lq IS NOT NULL GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nt,
         |               sum(sl) AS slt FROM per),
         |w1 AS (
         |  SELECT g, n_docs,
         |    CAST(sl AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 1000.0)
         |      AS mean_loss,
         |    CAST(sl AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 1000.0)
         |      - CAST(slt AS DOUBLE) / (CAST(nt AS DOUBLE) * 1000.0)
         |      AS excess_loss,
         |    CAST(n_docs AS DOUBLE) / CAST(nt AS DOUBLE) AS base_share
         |  FROM per CROSS JOIN tot),
         |w2 AS (
         |  SELECT g, n_docs, mean_loss, excess_loss, base_share,
         |    CAST(floor(base_share * exp($DrEta * excess_loss)
         |      * 1.0E12) AS BIGINT) AS rq
         |  FROM w1),
         |rs AS (SELECT CAST(sum(rq) AS BIGINT) AS rst FROM w2)
         |SELECT g, n_docs, mean_loss, excess_loss, base_share,
         |  CAST(rq AS DOUBLE) / CAST(rst AS DOUBLE) AS weight
         |FROM w2 CROSS JOIN rs""".stripMargin,

    "q_script_profile" -> {
      val classes = Seq(
        "latin" -> "[A-Za-z]", "digit" -> "[0-9]",
        "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
        "greek" -> "[\\x{0370}-\\x{03FF}]",
        "han" -> "[\\x{4E00}-\\x{9FFF}]",
        "space" -> "[ \\t\\n]")
      val per = classes.map { case (nm, re) =>
        s"CAST(length(text) - length(regexp_replace(text, '$re', '', 'g')) AS BIGINT) AS __$nm"
      }.mkString(",\n         |    ")
      val sums = classes.map { case (nm, _) =>
        s"CAST(sum(__$nm) AS BIGINT) AS n_$nm" }.mkString(",\n         |    ")
      val fracs = classes.map { case (nm, _) =>
        s"CASE WHEN n_chars = 0 THEN NULL ELSE CAST(n_$nm AS DOUBLE) / CAST(n_chars AS DOUBLE) END AS frac_$nm"
      }.mkString(",\n         |  ")
      s"""WITH per AS (
         |  SELECT source AS g, CAST(length(text) AS BIGINT) AS __c,
         |    $per
         |  FROM documents),
         |a AS (
         |  SELECT g, CAST(sum(__c) AS BIGINT) AS n_chars,
         |    $sums
         |  FROM per GROUP BY 1)
         |SELECT g, n_chars, ${classes.map(c => "n_" + c._1).mkString(", ")},
         |  $fracs
         |FROM a""".stripMargin
    },

    "q_lsh_plan" -> {
      val arms = LshConfigs.map { case (b, r) =>
        val sr = powSql("s", r)
        val p = s"(1.0 - ${powSql(s"(1.0 - $sr)", b)})"
        val t = sqrtSql(s"${1.0 / b}", r)
        s"""SELECT CAST($b AS BIGINT) AS b, CAST($r AS BIGINT) AS r, s,
           |  $p AS p_collision, $t AS threshold FROM grid""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH grid AS (
         |  SELECT CAST(i AS DOUBLE) / ${LshGridN + 1}.0 AS s
         |  FROM (SELECT unnest(range(1, ${LshGridN + 1})) AS i))
         |$arms""".stripMargin
    }
  )
}
