package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluation estimators over sampled attempts and pairwise
  * preferences — the measurement layer of an LLM training loop:
  * pass@k for sampled-generation benchmarks, and preference duels →
  * win matrices → Bradley–Terry strength ratings (the Elo-family
  * model RLHF reward evaluation and arena leaderboards run on).
  *
  * Reference lineage: the reference's surface is grouped counts over
  * streams (api.clj:49-55); these are the grouped-count family
  * applied to the eval questions a model-training pipeline asks.
  */
object Preference {

  /** Unbiased pass@k (Chen et al. 2021, HumanEval appendix A):
    * pass@k = 1 − C(n−c, k)/C(n, k) per task, where n = attempts and
    * c = correct attempts — estimated WITHOUT the naive (c/n)^k bias.
    * Each k is a compile-time literal, so the binomial ratio UNROLLS
    * as the fixed-order chained expression
    * ((n−c)/n)·((n−c−1)/(n−1))·… — only correctly-rounded IEEE
    * divides/multiplies, NO ln/exp (libm transcendentals are
    * within-1-ulp only and the last ulp differs across engines —
    * measured on this very estimator; the [[Dedup.lshPlan]] pow
    * lesson). n−c < k short-circuits to pass = 1; k > n emits NULL
    * (undefined).
    *
    * Shape: one map-combined groupBy(task) over the corpus, then a
    * |ks|-arm union over the |tasks|-row aggregate — post-aggregate
    * work only. NULL verdicts drop (no attempt was scored). */
  def passAtK(df: DataFrame, task: Column, correct: Column,
              ks: Seq[Int]): DataFrame = {
    val per = df.filter(correct.isNotNull)
      .groupBy(task.as("task"))
      .agg(count(lit(1)).as("n"),
        sum(when(correct, 1L).otherwise(0L)).as("c"))
    ks.map { k =>
      val prod = (0 until k).map(i =>
        (col("n") - col("c") - lit(i.toLong)).cast("double") /
          (col("n") - lit(i.toLong)).cast("double")).reduce(_ * _)
      per.select(col("task"), col("n"), col("c"),
        lit(k.toLong).as("k"),
        when(col("n") < lit(k.toLong), lit(null).cast("double"))
          .when(col("n") - col("c") < lit(k.toLong), lit(1.0))
          .otherwise(lit(1.0) - prod).as("pass_rate"))
    }.reduce(_.unionByName(_))
  }

  /** Pairwise preference duels within blocks: for every within-block
    * pair of records carrying DIFFERENT items and different scores,
    * the higher-scoring record's item wins. Ties and same-item pairs
    * carry no preference signal and drop; NULL scores/blocks drop
    * (unscorable). Pair generation is the sorted-array unroll (the
    * [[graft.graph.Graph.cooccurrenceTopK]] discipline — one block
    * shuffle, never a record self-join); the block tuple is the scale
    * knob bounding the per-cell quadratic. Emits (win, lose). */
  def duels(df: DataFrame, block: Seq[(String, Column)], item: Column,
            score: Column, uid: Column): DataFrame = {
    val recs = df
      .select(block.map { case (n, c) => c.as(n) } ++
        Seq(item.as("__it"), score.as("__sc"), uid.as("__u")): _*)
      .filter(col("__it").isNotNull && col("__sc").isNotNull &&
        block.map { case (n, _) => col(n).isNotNull }.reduce(_ && _))
    val sets = recs
      .groupBy(block.map { case (n, _) => col(n) }: _*)
      .agg(array_sort(collect_set(
        struct(col("__u").as("u"), col("__it").as("it"),
          col("__sc").as("sc")))).as("cs"))
    sets.select(col("cs"), posexplode(col("cs")))
      .select(col("col").as("a"),
        explode(slice(col("cs"), col("pos") + lit(2), size(col("cs"))))
          .as("b"))
      .filter(col("a.it") =!= col("b.it") && col("a.sc") =!= col("b.sc"))
      .select(
        when(col("a.sc") > col("b.sc"), col("a.it")).otherwise(col("b.it"))
          .as("win"),
        when(col("a.sc") > col("b.sc"), col("b.it")).otherwise(col("a.it"))
          .as("lose"))
  }

  /** Win matrix over a duel stream: one row per unordered item pair
    * (item_a < item_b) with duel count, item_a's wins, and its win
    * rate. ONE map-combined groupBy on the ordered pair. */
  def winMatrix(duelDf: DataFrame): DataFrame =
    duelDf.select(least(col("win"), col("lose")).as("item_a"),
        greatest(col("win"), col("lose")).as("item_b"),
        when(col("win") < col("lose"), 1L).otherwise(0L).as("__wa"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_duels"), sum(col("__wa")).as("wins_a"))
      .withColumn("win_rate_a",
        col("wins_a").cast("double") / col("n_duels").cast("double"))

  /** Bradley–Terry strength ratings from a duel stream via `rounds`
    * MM iterations (Hunter, Annals of Statistics 2004):
    * w_i ← W_i / Σ_{j≠i} n_ij/(w_i + w_j), then renormalized so the
    * quantized ratings sum to |items|. Every per-round sum quantizes
    * to floor(·10⁹) LONG (order-independent), so the iteration is
    * bit-deterministic and the DuckDB twin unrolls the identical
    * chain.
    *
    * Scale shape: the corpus-sized work is the single duel groupBy;
    * the MM state is the |items|² pair-count table — ITEMS MUST BE
    * DOMAIN-SIZED (languages, sources, model ids: the arena regime),
    * collected once as a driver artifact (the centroid discipline)
    * and re-emitted as literals. Item identity is the STRING form of
    * the win/lose columns (non-string items are stringified — ratings
    * key on the rendered value, so items whose strings collide merge).
    * Emits (item, n_wins, n_duels, rating). */
  def bradleyTerry(duelDf: DataFrame, rounds: Int): DataFrame = {
    val spark = duelDf.sparkSession
    import spark.implicits._
    val pc = duelDf.groupBy(col("win").cast("string").as("win"),
        col("lose").cast("string").as("lose"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val items = pc.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    // index once by (win, lose) — the old per-pair linear scans of pc
    // were O(|items|²·|pc|) driver work (r14 ADVICE item 4)
    val pcMap = pc.map(p => (p._1, p._2) -> p._3).toMap
    // one pass over pc for ALL win totals (the per-item pc scan the r14
    // fix left behind was still O(|items|·|pc|) — r15 ADVICE item 2)
    val winTotals = pc.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val wins = items.map(i => i -> winTotals.getOrElse(i, 0L)).toMap
    val nij = items.map(i => i -> items.map(j => j ->
      (pcMap.getOrElse((i, j), 0L) + pcMap.getOrElse((j, i), 0L))
    ).toMap).toMap
    var w = items.map(_ => 1.0)
    for (_ <- 1 to rounds) {
      val next = items.zipWithIndex.map { case (i, ix) =>
        val denomQ = items.zipWithIndex.map { case (j, jx) =>
          if (jx == ix || nij(i)(j) == 0L) 0L
          else math.floor(nij(i)(j).toDouble / (w(ix) + w(jx)) * 1.0e9).toLong
        }.sum
        if (denomQ == 0L) 0.0
        else wins(i).toDouble / (denomQ.toDouble / 1.0e9)
      }
      val sq = next.map(x => math.floor(x * 1.0e9).toLong).sum
      val norm = items.length.toDouble / (sq.toDouble / 1.0e9)
      w = next.map(_ * norm)
    }
    items.zipWithIndex.map { case (i, ix) =>
      (i, wins(i), items.map(j => nij(i)(j)).sum, w(ix))
    }.toSeq.toDF("item", "n_wins", "n_duels", "rating")
  }
}
