package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over an event stream: funnel completion
  * and gap-based sessionization. The product-analytics twins of the
  * reference's windowed aggregations — both are single-key-shuffle plans
  * that survive scale (everything partitions by the user key; no
  * self-join explosion, no driver collection).
  */
object Funnel {

  /** Ordered-step funnel: for each user, the earliest time of step 1,
    * then the earliest step-2 event STRICTLY AFTER it, and so on —
    * the standard "view → click → purchase" conversion measurement
    * (each step must causally follow its predecessor; re-orderings
    * don't count). Emits (user_id, t1..tN, stage) where stage = number
    * of steps completed; users who never reach step 1 are absent.
    *
    * Plan shape: one filtered min-aggregation per step (filters push to
    * the scan) chained by equi-joins on the user key — N small
    * aggregations beat a collect_list fold because no per-user event
    * array is ever materialized (hot users would blow executor memory at
    * lake scale). Determinism: min(ts) and strict > are order-free.
    * Users with NULL keys survive step 1 (grouping keeps a NULL group on
    * both engines) but never advance (equi-joins drop NULL keys on both
    * engines) — the join/window NULL discipline SURVEY §8 documents. */
  def funnel(events: DataFrame, user: Column, ts: Column, etype: Column,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(etype === steps.head)
      .groupBy(user.as("user_id")).agg(min(ts).as("t1"))
    val stages = steps.zipWithIndex.tail.foldLeft(first) { case (prev, (st, i)) =>
      val cur = events.filter(etype === st)
        .select(user.as("user_id"), ts.as("__ts"))
        .join(prev.select(col("user_id"), col(s"t$i")), Seq("user_id"))
        .filter(col("__ts") > col(s"t$i"))
        .groupBy(col("user_id")).agg(min(col("__ts")).as(s"t${i + 1}"))
      prev.join(cur, Seq("user_id"), "left")
    }
    val stage = steps.indices.tail.foldLeft(lit(1)) { (acc, i) =>
      acc + when(col(s"t${i + 1}").isNotNull, 1).otherwise(0)
    }
    stages.select(col("user_id") +:
      steps.indices.map(i => col(s"t${i + 1}")) :+ stage.as("stage"): _*)
  }

  /** Gap-based sessionization: assigns every event a per-user session
    * sequence number — a new session starts when the gap to the previous
    * event is ≥ `gapMinutes` (same boundary rule as the q_session_window
    * aggregate, but emitting the per-EVENT assignment the downstream
    * enrichment join needs, not just per-session rollups).
    *
    * One shuffle+sort on the user key; the lag and the running sum share
    * a single window partition/order so Spark evaluates both in one
    * WindowExec pass. Ordering ties break by event id (deterministic
    * under repartitioning); NULL users sessionize together as one
    * partition on both engines. */
  def sessionize(events: DataFrame, user: Column, ts: Column, id: Column,
                 gapMinutes: Int): DataFrame = {
    val base = events.select(user.as("user_id"), id.as("event_id"), ts.as("ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prev = lag(col("ts"), 1).over(w)
    val boundary = when(prev.isNull ||
      col("ts") >= prev + expr(s"INTERVAL '$gapMinutes' MINUTE"), 1).otherwise(0)
    base.withColumn("__new", boundary)
      .withColumn("session_seq",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("long"))
      .drop("__new")
  }
}
