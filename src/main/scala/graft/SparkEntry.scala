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

  /** The oracle twin of [[graft.sources.Tables.events]]'s orphan-row
    * quarantine (same contract: event_id is the identity). */
  private val EvtGuardCte =
    "__evt AS (SELECT * FROM events WHERE event_id IS NOT NULL)"

  /** Queries that must see UNGUARDED reads (quarantine accounting —
    * they COUNT what the guards drop, so the rewrite must not apply). */
  private val RawTableQueries =
    Set("q_embed_quarantine", "q_doc_quarantine", "q_event_quarantine")

  private def guardTable(sql: String, table: String, alias: String,
                         cte: String): String = {
    if (!sql.contains(table)) sql
    else {
      val renamed = sql.replaceAll(s"\\b$table\\b", alias)
      if (renamed.startsWith("WITH RECURSIVE "))
        s"WITH RECURSIVE $cte,${renamed.drop(15)}"
      else if (renamed.startsWith("WITH ")) s"WITH $cte,${renamed.drop(5)}"
      else s"WITH $cte\n$renamed"
    }
  }

  private def guardEmbeddings(name: String, sql: String): String = {
    if (RawTableQueries(name)) sql
    else guardTable(
      guardTable(
        guardTable(sql, "documents", "__doc", DocGuardCte),
        "events", "__evt", EvtGuardCte),
      "embeddings", "__emb", EmbGuardCte)
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
