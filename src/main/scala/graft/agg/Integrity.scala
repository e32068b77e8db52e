package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Referential-integrity / constraint audit — the dbt-style contract
  * checks a pipeline runs before trusting a batch: foreign-key orphan
  * counts, primary-key duplicate counts, null rates, and domain
  * predicates, each reported as one (check, n_violations, n_total, ok)
  * row so a scheduler can gate promotion on `ok`.
  *
  * Reference lineage: the reference trusts its topics entirely
  * (api.clj has no validation surface); this is the QA layer any
  * 100 TB ingest needs in front of the operators in [[graft.llm]].
  *
  * Shape discipline: each check is one aggregate over one scan
  * (orphans via a LEFT ANTI hash join on the key — Spark picks
  * broadcast when the parent side is small, shuffled-hash otherwise;
  * duplicates via a key groupBy); the union of 1-row results is
  * driver-free. No check ever collects data rows.
  */
object Integrity {

  /** Orphan-FK audit: rows of `child` whose `fk` has no match in
    * `parent.pk`. NULL fks are not orphans (SQL FK semantics — NULL
    * means "no reference"); count them with [[nullCount]] instead. */
  def fkOrphans(name: String, child: DataFrame, fk: Column,
                parent: DataFrame, pk: Column): DataFrame = {
    val c = child.select(fk.as("k"))
    // single-pass form (r16): one LEFT join against the DISTINCT parent
    // key set (so no fan-out) counts total and orphans in the same scan —
    // the old left_anti + separate total agg + crossJoin scanned the child
    // twice and paid an extra 1-row broadcast join. A NULL fk never
    // matches the join (SQL semantics) and is excluded from violations by
    // the same isNotNull guard the anti-join form applied pre-join.
    val p = parent.select(pk.as("k")).filter(col("k").isNotNull).distinct()
      .withColumn("__m", lit(1))
    c.join(p, Seq("k"), "left")
      .agg(count(lit(1)).as("n_total"),
        coalesce(sum(when(col("k").isNotNull && col("__m").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("n_violations"))
      .select(lit(name).as("check"),
        col("n_violations"), col("n_total"),
        (col("n_violations") === 0L).as("ok"))
  }

  /** Duplicate-PK audit: number of EXTRA rows beyond one per key
    * (so a clean table reports 0, and the count is how many rows a
    * dedup would drop). NULL keys all collide on one group — a NULL
    * pk is itself a violation, which this accounting inherits. */
  def dupKeys(name: String, df: DataFrame, key: Column): DataFrame = {
    val g = df.select(key.as("k")).groupBy(col("k"))
      .agg(count(lit(1)).as("c"))
    g.agg(sum(col("c") - lit(1L)).as("n_violations"),
        sum(col("c")).as("n_total"))
      .select(lit(name).as("check"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"),
        coalesce(col("n_total"), lit(0L)).as("n_total"),
        (coalesce(col("n_violations"), lit(0L)) === 0L).as("ok"))
  }

  /** NULL-rate audit of one column. */
  def nullCount(name: String, df: DataFrame, c: Column): DataFrame =
    df.agg(sum(when(c.isNull, 1L).otherwise(0L)).as("n_violations"),
        count(lit(1)).as("n_total"))
      .select(lit(name).as("check"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"),
        coalesce(col("n_total"), lit(0L)).as("n_total"),
        (coalesce(col("n_violations"), lit(0L)) === 0L).as("ok"))

  /** Domain-predicate audit: rows violating `valid` (NULLs in the
    * predicate count as violations — an unverifiable row is not a
    * verified one). */
  def domainCheck(name: String, df: DataFrame, valid: Column): DataFrame =
    df.agg(sum(when(valid, 0L).otherwise(1L)).as("n_violations"),
        count(lit(1)).as("n_total"))
      .select(lit(name).as("check"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"),
        coalesce(col("n_total"), lit(0L)).as("n_total"),
        (coalesce(col("n_violations"), lit(0L)) === 0L).as("ok"))

  /** Assemble an audit report from individual checks. */
  def audit(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_.unionByName(_))
}
