package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy-risk audit for a training corpus — the release-gate
  * companion of [[TextAnalysis.piiScrub]]: scrubbing removes the
  * direct identifiers, this layer measures whether the REMAINING
  * quasi-identifier combinations still single people (or documents)
  * out. k-anonymity (Sweeney): every quasi-identifier equivalence
  * class must contain ≥ k records; l-diversity (Machanavalli et al.):
  * each class must carry ≥ l distinct values of the sensitive
  * attribute, or the class leaks it by membership alone.
  *
  * Reference lineage: the reference's aggregation surface stops at
  * grouped counts (api.clj:49-55); this is the grouped-count family
  * applied to the disclosure-risk question a 100 TB corpus release
  * actually asks.
  */
object Privacy {

  /** k-anonymity + l-diversity audit over named quasi-identifier
    * columns: one row per equivalence class with its size, its
    * sensitive-value diversity, both verdicts, and the corpus-level
    * suppression accounting (how many records a k-anonymous release
    * would have to drop) attached as constants.
    *
    * NULL handling: a NULL quasi-identifier value is its own class
    * value (NULL-safe grouping — the standard generalization
    * hierarchy's top level), so rows with missing QI fields still
    * count toward disclosure risk instead of silently dropping. A
    * NULL sensitive value does not count toward l-diversity.
    *
    * Exactness: class sizes and distinct counts are exact integers;
    * the one emitted double (suppression_rate) is a single division
    * of two exact LONGs, mirrored in the oracle.
    *
    * Shape: ONE map-side-combined groupBy on the QI tuple, then all
    * corpus-level folds ride a window over the class table (classes ≪
    * corpus; no second scan, no broadcast subtree re-running the
    * corpus aggregate). Scan-bound at any scale. */
  def kAnonymity(df: DataFrame, qi: Seq[(String, Column)],
                 sensitive: Column, k: Int, l: Int): DataFrame = {
    val classes = df
      .select(qi.map { case (n, c) => c.as(n) } :+ sensitive.as("__s"): _*)
      .groupBy(qi.map { case (n, _) => col(n) }: _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(col("__s")).as("l_distinct"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    classes
      .withColumn("k_anonymous", col("class_size") >= lit(k.toLong))
      .withColumn("l_diverse", col("l_distinct") >= lit(l.toLong))
      .withColumn("n_total", sum(col("class_size")).over(wAll))
      .withColumn("n_suppressed",
        coalesce(sum(when(!col("k_anonymous"), col("class_size")))
          .over(wAll), lit(0L)))
      .withColumn("suppression_rate",
        col("n_suppressed").cast("double") / col("n_total").cast("double"))
  }
}
