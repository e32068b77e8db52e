package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.entry.{AggQueries, AuditQueries, CoreQueries, CurationQueries, EvalQueries, GraphQueries, GrowthQueries, InferQueries, JoinQueries, LinkQueries, LlmQueries, QaQueries, SelectionQueries, StatsQueries, TrendQueries, UrlQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2): the reference's
  * implemented surface (CoreQueries), its declared roadmap
  * (AggQueries/JoinQueries) and the LLM-data-pipeline extensions
  * (LlmQueries). Every entry with a SQL-expressible result also appears in
  * `oracleSql` with IDENTICAL column names (the driver sorts columns by
  * name before hashing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ AggQueries.queries ++ JoinQueries.queries ++
      LlmQueries.queries ++ GraphQueries.queries ++ UrlQueries.queries ++
      SelectionQueries.queries ++ StatsQueries.queries ++ QaQueries.queries ++
      EvalQueries.queries ++ InferQueries.queries ++ LinkQueries.queries ++
      TrendQueries.queries ++ GrowthQueries.queries ++ AuditQueries.queries ++
      CurationQueries.queries

  /** The oracle twin of [[graft.sources.Tables.embeddings]]'s non-finite
    * quarantine: every oracle that reads `embeddings` is mechanically
    * rewritten to read through this CTE (token `embeddings` → `__emb`),
    * so both engines see the identical post-guard relation. Predicate
    * mirrors [[graft.functions.FiniteVector]]: drop any row whose
    * vector has a NaN/±Inf/NULL element; keep NULL vectors (the
    * `embedding IS NULL OR` arm — `len(NULL)` is NULL, so without it
    * the WHERE would silently drop them on the oracle side only). */
  private val EmbGuardCte =
    "__emb AS (SELECT * FROM embeddings WHERE embedding IS NULL OR " +
      "len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) = 0)"

  /** The oracle twin of [[graft.sources.Tables.documents]]'s orphan-row
    * quarantine: NULL doc_id rows drop at the seam (see the scaladoc
    * there for the five ways they poison id-keyed analytics). */
  private val DocGuardCte =
    "__doc AS (SELECT * FROM documents WHERE doc_id IS NOT NULL)"

  /** SQL twin of `Tables.finiteOrNull`: NULL metric passes, NaN/±Inf
    * quarantines (isfinite(NULL) is NULL, hence the explicit arm). */
  private def finiteSql(c: String): String = s"($c IS NULL OR isfinite($c))"

  /** The oracle twin of [[graft.sources.Tables.events]]'s quarantine
    * (same contract: event_id is the identity; value is a stored
    * double metric → non-finite rows drop, r16). */
  private val EvtGuardCte =
    "__evt AS (SELECT * FROM events WHERE event_id IS NOT NULL AND " +
      finiteSql("value") + ")"

  /** Oracle twins of the stored-double metric quarantines
    * ([[graft.sources.Tables.metricColumns]] is the single source of
    * truth for WHICH columns; this derives the CTEs from it so the
    * engine filter and the oracle CTE cannot drift). */
  private val MetricGuards: Seq[(String, String, String)] =
    Seq("lineitem" -> "__li", "orders" -> "__ord", "customer" -> "__cust",
      "part" -> "__part", "supplier" -> "__supp").map { case (t, a) =>
      val pred = graft.sources.Tables.metricColumns(t)
        .map(finiteSql).mkString(" AND ")
      (t, a, s"$a AS (SELECT * FROM $t WHERE $pred)")
    }

  /** Queries that must see UNGUARDED reads (quarantine accounting —
    * they COUNT what the guards drop, so the rewrite must not apply). */
  private val RawTableQueries =
    Set("q_embed_quarantine", "q_doc_quarantine", "q_event_quarantine",
      "q_metric_quarantine")

  /** Rewrite `sql` so every reference to `table` reads through the guard
    * CTE instead. The rewrite is purely LEXICAL — a `\b`-token rename plus
    * a prefix splice — so it is only sound under the invariants below,
    * each enforced with a loud `require` (a violating future oracle must
    * fail at Verify time, never be silently corrupted — r15 ADVICE):
    *   1. the guarded name never appears inside a quoted string literal
    *      (the rename would rewrite the literal's VALUE);
    *   2. the oracle does not already mention the guard alias (a second
    *      rewrite pass, or a hand-written CTE, would collide);
    *   3. the oracle does not define its own CTE named after the table
    *      (renaming its definition head would collide with the guard CTE);
    *   4. the statement starts with SELECT or WITH [RECURSIVE] — matched
    *      case-insensitively after trimming, so whitespace/lowercase
    *      prefixes splice correctly instead of falling through.
    * Negative coverage: GuardRewriteSpec. */
  private[graft] def guardTable(sql: String, table: String, alias: String,
                                cte: String): String = {
    val token = s"\\b$table\\b".r
    if (token.findFirstIn(sql).isEmpty) sql
    else {
      require(
        !"'(?:[^']|'')*'".r.findAllIn(sql)
          .exists(lit => token.findFirstIn(lit).isDefined),
        s"guardTable($table): name occurs inside a string literal; " +
          "the token rename would corrupt the literal's value")
      require(!sql.contains(alias),
        s"guardTable($table): oracle already references $alias " +
          "(double rewrite or hand-written guard CTE)")
      require(s"(?i)\\b$table\\s+AS\\s*\\(".r.findFirstIn(sql).isEmpty,
        s"guardTable($table): oracle defines a CTE named $table; " +
          "renaming its head would collide with the guard CTE")
      val renamed = token.replaceAllIn(sql, alias).strip
      "(?is)^(WITH\\s+RECURSIVE|WITH)\\s+".r.findPrefixMatchOf(renamed) match {
        case Some(m) =>
          s"${m.group(1)} $cte,${renamed.substring(m.end)}"
        case None =>
          require(renamed.regionMatches(true, 0, "SELECT", 0, 6),
            s"guardTable($table): oracle must start with SELECT or WITH, " +
              s"got: ${renamed.take(40)}")
          s"WITH $cte\n$renamed"
      }
    }
  }

  private[graft] def guardEmbeddings(name: String, sql: String): String = {
    if (RawTableQueries(name)) sql
    else {
      val base = guardTable(
        guardTable(
          guardTable(sql, "documents", "__doc", DocGuardCte),
          "events", "__evt", EvtGuardCte),
        "embeddings", "__emb", EmbGuardCte)
      MetricGuards.foldLeft(base) { case (acc, (t, a, cte)) =>
        guardTable(acc, t, a, cte)
      }
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    (CoreQueries.oracle ++ AggQueries.oracle ++ JoinQueries.oracle ++
      LlmQueries.oracle ++ GraphQueries.oracle ++ UrlQueries.oracle ++
      SelectionQueries.oracle ++ StatsQueries.oracle ++ QaQueries.oracle ++
      EvalQueries.oracle ++ InferQueries.oracle ++ LinkQueries.oracle ++
      TrendQueries.oracle ++ GrowthQueries.oracle ++ AuditQueries.oracle ++
      CurationQueries.oracle)
      .map { case (n, sql) => n -> guardEmbeddings(n, sql) }
}
