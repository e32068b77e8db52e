package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** First-match stream branching (SURVEY.md §2.1 #7-8).
  *
  * Reference semantics (reference: src/kafka_streams_clojure/api.clj:62-88;
  * Kafka 1.0 `KStream.branch` contract): each record is routed to the FIRST
  * predicate that accepts it; records matching no predicate are dropped.
  * `branch-map` names the branches; the reference relies on Clojure
  * array-map iteration order (api.clj:81-87) — here the API takes an
  * explicitly ordered `Seq[(String, Column)]` instead (SURVEY.md §1.3.4).
  *
  * Implementation: cumulative negation — branch i keeps
  * `pᵢ && !p₁ && … && !pᵢ₋₁` — which reproduces first-match exactly and
  * stays fully declarative (each branch is an independent Catalyst plan
  * with its own pushdown). For the single-pass cost model of the reference
  * (each record evaluated once), use [[branchTagged]], which labels rows in
  * one scan; at scale, persist the tagged frame and filter per branch.
  */
object Branch {

  /** Positional branches, first-match, non-matching rows dropped. */
  def branch(df: DataFrame, preds: Seq[Column]): Seq[DataFrame] =
    preds.zipWithIndex.map { case (p, i) =>
      val notEarlier = preds.take(i).foldLeft(lit(true))((acc, q) => acc && !coalesce(q, lit(false)))
      df.filter(coalesce(p, lit(false)) && notEarlier)
    }

  /** Named, ordered branches → name → substream map. */
  def branchMap(df: DataFrame, branches: Seq[(String, Column)]): Map[String, DataFrame] = {
    val dfs = branch(df, branches.map(_._2))
    branches.map(_._1).zip(dfs).toMap
  }

  /** Single-pass variant: adds a `branch` column holding the name of the
    * first matching predicate (null = dropped). One scan + one predicate
    * evaluation per record — the reference's cost model (§3.2). Fan-out:
    * `tagged.filter($"branch" === name)` per branch, ideally after
    * `persist()` in a `foreachBatch`.
    */
  def branchTagged(df: DataFrame, branches: Seq[(String, Column)]): DataFrame = {
    // when() chains evaluate in order — first match wins, rest short-circuit
    val first = when(coalesce(branches.head._2, lit(false)), lit(branches.head._1))
    val chained = branches.tail.foldLeft(first) { case (acc, (name, p)) =>
      acc.when(coalesce(p, lit(false)), lit(name))
    }
    df.withColumn("branch", chained)
  }
}
