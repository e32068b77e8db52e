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

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ AggQueries.oracle ++ JoinQueries.oracle ++
      LlmQueries.oracle ++ GraphQueries.oracle ++ UrlQueries.oracle ++
      SelectionQueries.oracle ++ StatsQueries.oracle ++ QaQueries.oracle ++
      EvalQueries.oracle ++ InferQueries.oracle ++ LinkQueries.oracle ++
      TrendQueries.oracle ++ GrowthQueries.oracle ++ AuditQueries.oracle ++
      CurationQueries.oracle
}
