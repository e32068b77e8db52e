package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy-risk audit for a training corpus — the release-gate
  * companion of [[TextAnalysis.piiScrub]]: scrubbing removes the
  * direct identifiers, this layer measures whether the REMAINING
  * quasi-identifier combinations still single people (or documents)
  * out. k-anonymity (Sweeney): every quasi-identifier equivalence
  * class must contain ≥ k records; l-diversity (Machanavajjhala et
  * al., ICDE'06):
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
    * Shape: ONE map-side-combined groupBy on the QI tuple; the class
    * table persists (tracked — [[graft.core.Caches]]) and feeds both
    * the per-class verdicts and a 1-row totals aggregate that
    * broadcast-joins back. NOT a global window: the worst case for a
    * privacy audit is near-unique quasi-identifiers, where |classes| ≈
    * |corpus| and an unpartitioned window would funnel the whole class
    * table through one task. The totals fold stays map-combined
    * (partial per partition, one 2-long final reduce), so the only
    * single-partition traffic is per-partition partial rows. */
  def kAnonymity(df: DataFrame, qi: Seq[(String, Column)],
                 sensitive: Column, k: Int, l: Int): DataFrame = {
    val classes = graft.core.Caches.track(df
      .select(qi.map { case (n, c) => c.as(n) } :+ sensitive.as("__s"): _*)
      .groupBy(qi.map { case (n, _) => col(n) }: _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(col("__s")).as("l_distinct")))
    val totals = classes.agg(
      sum(col("class_size")).as("n_total"),
      coalesce(sum(when(col("class_size") < lit(k.toLong),
        col("class_size"))), lit(0L)).as("n_suppressed"))
    classes
      .withColumn("k_anonymous", col("class_size") >= lit(k.toLong))
      .withColumn("l_diverse", col("l_distinct") >= lit(l.toLong))
      .crossJoin(broadcast(totals))
      .withColumn("suppression_rate",
        col("n_suppressed").cast("double") / col("n_total").cast("double"))
  }

  /** Per-group gate-disparity audit — the fairness readout a curation
    * gate ships beside its pass counts: each group's pass rate, its
    * ratio to the corpus-wide rate (disparate-impact ratio), and the
    * four-fifths verdict (the EEOC 80% rule, the standard first
    * screen): a source/language whose documents clear the quality
    * gate at under 0.8× the overall rate is being systematically
    * filtered and belongs in the release notes.
    *
    * NULL handling: a NULL group is its own class (the [[kAnonymity]]
    * rule — missing provenance is itself a disparity bucket); NULL
    * gate verdicts drop (no decision was made).
    *
    * Exactness: counts exact; pass_rate / overall ratio emitted as
    * one mirrored double expression each; overall = 0 → NULL ratios.
    *
    * Shape: one map-combined groupBy on the group, corpus totals fold
    * by window over the group table. Scan-bound. */
  def gateParity(df: DataFrame, group: Column, pass: Column,
                 floorRatio: Double = 0.8): DataFrame = {
    val g = df.filter(pass.isNotNull)
      .select(group.as("g"), when(pass, 1L).otherwise(0L).as("p"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("n_pass"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val overall = sum(col("n_pass")).over(wAll).cast("double") /
      sum(col("n")).over(wAll).cast("double")
    val rate = col("n_pass").cast("double") / col("n").cast("double")
    g.withColumn("pass_rate", rate)
      .withColumn("overall_rate", overall)
      .withColumn("parity_ratio",
        when(col("overall_rate") === lit(0.0), lit(null).cast("double"))
          .otherwise(col("pass_rate") / col("overall_rate")))
      .withColumn("meets_four_fifths",
        when(col("parity_ratio").isNull, lit(null).cast("boolean"))
          .otherwise(col("parity_ratio") >= lit(floorRatio)))
  }

  /** t-closeness audit (Li et al., ICDE'07) — the third leg of the
    * disclosure triad after [[kAnonymity]]'s class-size and
    * l-diversity gates: a class can be large AND diverse yet still
    * leak if its sensitive-value MIX differs sharply from the
    * corpus-wide mix (the "this zip code is 90% one diagnosis"
    * failure). Distance here is total variation
    * TV = ½ Σ_s |p_class(s) − p_global(s)| — the categorical
    * t-closeness instantiation; a class passes when TV ≤ t.
    *
    * No sensitive-value spine is materialized: absent values
    * contribute Σ_{absent} p_global(s) = 1 − Σ_{present} p_global(s)
    * (the complement identity), so
    * TV = (Σ_present |n_cs·N − n_s·n_c| + (N − Σ_present n_s)·n_c)
    *      / (2·n_c·N)
    * — every term an exact integer cross-multiplication in
    * DECIMAL(38,0) (n_cs·N squares past LONG at lake scale), ONE
    * final double division, mirrored token-identically in the twin.
    * NULL sensitive values drop (no disclosure semantics); NULL
    * quasi-identifiers form their own class (the [[kAnonymity]]
    * rule).
    *
    * Shape: ONE (qi, s) cell aggregate off the corpus; the persisted
    * cell table feeds the sensitive marginal and class totals by
    * PARTITIONED windows, while the corpus total is a 1-row aggregate
    * broadcast-joined back (the [[kAnonymity]] reshape — with
    * near-unique quasi-identifiers the cell table is corpus-sized and
    * a global window would single-task it), then one class-keyed
    * re-agg. Scan-bound at any scale. */
  def tCloseness(df: DataFrame, qi: Seq[(String, Column)],
                 sensitive: Column, t: Double): DataFrame = {
    val qiCols = qi.map { case (n, _) => col(n) }
    val cells = graft.core.Caches.track(df.filter(sensitive.isNotNull)
      .select(qi.map { case (n, c) => c.as(n) } :+ sensitive.as("__s"): _*)
      .groupBy(qiCols :+ col("__s"): _*)
      .agg(count(lit(1)).as("n_cs")))
    val wS = Window.partitionBy(col("__s"))
    val wC = Window.partitionBy(qiCols: _*)
    val m = cells
      .withColumn("n_s", sum(col("n_cs")).over(wS))
      .withColumn("n_c", sum(col("n_cs")).over(wC))
      .crossJoin(broadcast(cells.agg(sum(col("n_cs")).as("n"))))
    // decimal BEFORE the multiply — n_cs·N squares past LONG at lake
    // scale (the gini sw discipline)
    val num = abs(col("n_cs").cast("decimal(38,0)") * col("n") -
      col("n_s").cast("decimal(38,0)") * col("n_c"))
    m.groupBy(qiCols: _*)
      .agg(max(col("n_c")).as("class_size"),
        count(lit(1)).as("n_sens_present"),
        max(col("n")).as("n_total"),
        sum(num).as("dev"),
        sum(col("n_s").cast("decimal(38,0)")).as("mass_present"))
      .select(qiCols ++ Seq(col("class_size"), col("n_sens_present"),
        ((col("dev").cast("double") +
          (col("n_total").cast("decimal(38,0)") * col("class_size") -
            col("mass_present") * col("class_size")).cast("double")) /
          (lit(2.0) * col("class_size").cast("double") *
            col("n_total").cast("double"))).as("tv_dist")): _*)
      .withColumn("t_close", col("tv_dist") <= lit(t))
  }
}
