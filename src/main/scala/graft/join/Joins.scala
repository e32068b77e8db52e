package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join family (SURVEY.md §2.1 #9, §2.3).
  *
  * The reference ships only the join-result combiner (`value-joiner`,
  * reference: src/kafka_streams_clojure/api.clj:90-94) and TODO-lists the
  * join operators themselves (api.clj:53-55; README.md:30-34). Here the
  * full family is first-class, with the physical strategy chosen for
  * scale:
  *
  *  - enrichment (stream/fact ⋈ small dim): explicit `broadcast()` hint —
  *    no shuffle of the large side, the decisive plan at 100 TB;
  *  - large-large equi-join: sort-merge/shuffled-hash via Catalyst + AQE
  *    (skew-join splitting on);
  *  - semi/anti: `left_semi`/`left_anti` — no payload duplication.
  */
object Joins {

  /** `value-joiner` twin: combine joined rows into a projection
    * (reference: api.clj:90-94). */
  def valueJoin(left: DataFrame, right: DataFrame, cond: Column, joinType: String,
                project: Seq[Column]): DataFrame =
    left.join(right, cond, joinType).select(project: _*)

  /** Enrichment join against a small dimension — broadcast-hash.
    * The stream-table join of the reference's roadmap
    * (README.md:33-34): at scale the dim fits in memory, the fact side
    * never shuffles. */
  def enrich(fact: DataFrame, dim: DataFrame, cond: Column,
             joinType: String = "inner"): DataFrame =
    fact.join(broadcast(dim), cond, joinType)

  /** Large-large equi-join on named key columns; Catalyst picks SMJ/SHJ,
    * AQE handles skew at runtime. */
  def largeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                joinType: String = "inner"): DataFrame =
    left.join(right, keys, joinType)

  /** EXISTS — rows of `left` with a match in `right`. */
  def semi(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  /** NOT EXISTS — rows of `left` with no match in `right`. */
  def anti(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

  /** As-of join: for each left row, the single latest right row with
    * `rightTs <= leftTs` sharing `keys` — the time-series enrichment the
    * reference cannot express. Composed from built-ins (union + window)
    * rather than a custom SparkPlan: one shuffle on the key, no range
    * explosion, which survives scale-up. Right columns come back
    * null-padded when no prior row exists.
    *
    * Implementation: tag both sides, union by key+time, carry-forward the
    * last right payload with `last(_, ignoreNulls=true)` over
    * (key, time, side-priority), keep left rows.
    */
  def asOf(left: DataFrame, leftTs: Column, right: DataFrame, rightTs: Column,
           keys: Seq[String], payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = left.withColumn("__t", leftTs).withColumn("__side", lit(1))
    val lPadded = payload.foldLeft(l)((d, c) => d.withColumn(s"__p_$c", lit(null).cast(right.schema(c).dataType)))
    val r = right.withColumn("__t", rightTs).withColumn("__side", lit(0))
    val rSel = r.select((keys.map(col) :+ col("__t") :+ col("__side")) ++ payload.map(c => col(c).as(s"__p_$c")): _*)
    val lCols = lPadded.columns.filterNot(c => c.startsWith("__p_") || c == "__t" || c == "__side")
    val lSel = lPadded.select((keys.map(col) :+ col("__t") :+ col("__side")) ++
      payload.map(c => col(s"__p_$c")) ++ lCols.filterNot(keys.contains).map(col): _*)
    // union with schema alignment: right side lacks the left payload columns
    val rAligned = lCols.filterNot(keys.contains).foldLeft(rSel)((d, c) =>
      d.withColumn(c, lit(null).cast(lSel.schema(c).dataType)))
    val u = lSel.unionByName(rAligned.select(lSel.columns.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = payload.foldLeft(u)((d, c) =>
      d.withColumn(c, last(col(s"__p_$c"), ignoreNulls = true).over(w)))
    filled.filter(col("__side") === 1)
      .drop("__t", "__side")
      .drop(payload.map(c => s"__p_$c"): _*)
  }
}
