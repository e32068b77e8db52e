package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — the Fellegi–Sunter model (Fellegi &
  * Sunter, JASA 1969), the standard entity-resolution scorer every
  * dedup/crosswalk pipeline reaches for once exact and fuzzy keys run
  * out: per-field agreement patterns are weighted by how much more
  * likely agreement is among matches than among random pairs, and the
  * pair's total log-likelihood-ratio weight ranks link candidates.
  *
  * Reference lineage: the reference's surface composes per-record
  * transducer steps (api.clj:157-159) and TODO-lists joins
  * (api.clj:53-55); pairwise linkage is the LLM-pipeline extension
  * mandate (crosswalking user/customer records before training-data
  * aggregation).
  */
object Linkage {

  /** Fellegi–Sunter candidate scoring over blocked pairs.
    *
    * Model: for field j with match probability m (P(agree | match),
    * a fixed prior — 0.9 is the classic choice) and chance-agreement
    * probability u_j (P(agree | non-match), ESTIMATED from the
    * candidate pairs themselves — the standard u-from-data shortcut
    * when no labeled matches exist), the agreement weight is
    * log₂(m/u_j) and the disagreement weight log₂((1−m)/(1−u_j));
    * a pair's score is the sum over fields. Weights are quantized to
    * floor(w·10⁶) LONGs before the per-pair sum (the PSI discipline)
    * so scores fold exactly in any order; u_j is clamped to
    * [10⁻⁹, 1−10⁻⁹] (a field that always/never agrees within blocks
    * carries ~zero discriminating signal rather than ±∞).
    *
    * Shape (the [[graft.graph.Graph.cooccurrenceTopK]] discipline):
    * records gather into per-block sorted arrays (ONE hash shuffle on
    * the block key — never a record self-join), pairs unroll via the
    * chained posexplode + explode-of-slice codegen generators, the
    * candidate-sized pair table persists once and feeds (a) the 1-row
    * u-rate aggregate and (b) the scoring pass, with the u-rates
    * broadcast back — the pair stream never shuffle-joins. Block
    * sizing is the scale knob: at 100 TB the block tuple must bound
    * the per-cell quadratic (add a coarse content key), exactly the
    * [[Dedup.editDistancePairs]] contract.
    *
    * NULL fields: agreement uses null-safe equality (NULL ≡ NULL
    * agrees, NULL vs value disagrees) — mirrored with IS NOT DISTINCT
    * FROM in the oracle.
    *
    * Emits the `topK` pairs by (score DESC, id1, id2): (id1, id2,
    * agree_<field>..., n_agree, score). */
  def fellegiSunter(df: DataFrame, id: Column,
                    block: Seq[(String, Column)],
                    fields: Seq[(String, Column)],
                    m: Double, topK: Int): DataFrame = {
    val fNames = fields.map(_._1)
    val recs = df.select(
      (block.map { case (n, c) => c.as(n) }) ++
        Seq(struct(id.as("rid") +: fields.map { case (n, c) => c.as(n) }: _*)
          .as("rec")): _*)
      // NULL block keys are DROPPED, not blocked together: groupBy
      // would coalesce every NULL-key record into one real block (an
      // unbounded quadratic cell at lake scale) while the oracle's
      // equi-join semantics silently skips them — pin ONE semantics
      // (the equi-join one, matching Preference.duels' explicit
      // non-null block filter) and let the adversarial NULL-nation
      // customer row prove it (r14 ADVICE item 2)
      .filter(block.map { case (n, _) => col(n).isNotNull }
        .reduce(_ && _))
    val sets = recs
      .groupBy(block.map { case (n, _) => col(n) }: _*)
      .agg(array_sort(collect_set(col("rec"))).as("cs"))
    val pairs = graft.core.Caches.track(
      sets.select(col("cs"), posexplode(col("cs")))
        .select(col("col").as("a"),
          explode(slice(col("cs"), col("pos") + lit(2), size(col("cs"))))
            .as("b"))
        .select(Seq(col("a.rid").as("id1"), col("b.rid").as("id2")) ++
          fNames.map(n =>
            (col(s"a.$n") <=> col(s"b.$n")).as(s"agree_$n")): _*))
    // u_j = candidate-pair agreement rate — ONE 1-row aggregate,
    // broadcast back (never a window over the pair table)
    val uRow = pairs.agg(
      count(lit(1)).as("__n"),
      fNames.map(n => sum(when(col(s"agree_$n"), 1L).otherwise(0L))
        .as(s"__na_$n")): _*)
    val scored = pairs.crossJoin(broadcast(uRow))
    // clamped u, then the two quantized log2 weights per field — the
    // doubles run the identical op sequence in the oracle
    def uOf(n: String): Column = least(greatest(
      col(s"__na_$n").cast("double") / col("__n").cast("double"),
      lit(1e-9)), lit(1.0 - 1e-9))
    def wAgree(n: String): Column =
      floor(log(lit(m) / uOf(n)) / log(lit(2.0)) * lit(1e6)).cast("long")
    def wDis(n: String): Column =
      floor(log(lit(1.0 - m) / (lit(1.0) - uOf(n))) / log(lit(2.0)) *
        lit(1e6)).cast("long")
    val scoreQ = fNames.map(n =>
      when(col(s"agree_$n"), wAgree(n)).otherwise(wDis(n)))
      .reduce(_ + _)
    val nAgree = fNames.map(n =>
      when(col(s"agree_$n"), 1L).otherwise(0L)).reduce(_ + _)
    scored
      .withColumn("__sq", scoreQ)
      .withColumn("n_agree", nAgree)
      .orderBy(col("__sq").desc, col("id1"), col("id2")).limit(topK)
      .select(Seq(col("id1"), col("id2")) ++
        fNames.map(n => col(s"agree_$n")) ++
        Seq(col("n_agree"),
          (col("__sq").cast("double") / lit(1e6)).as("score")): _*)
  }
}
