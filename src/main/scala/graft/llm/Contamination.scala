package graft.llm

import graft.functions.GraftFunctions._
import graft.functions.ShingleHashes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/test contamination detection — the decontamination step every
  * serious training-data pipeline runs before training: find documents
  * in the TRAINING corpus that share verbatim n-gram spans with an
  * EVALUATION/benchmark set, so benchmark answers don't leak into the
  * training mix (the reference pipeline has no equivalent; this is part
  * of the driver-mandated LLM-pipeline surface).
  *
  * Method: per-doc DISTINCT token n-grams on both sides (the native
  * single-pass [[graft.functions.Shingles]] expression), equi-join on
  * the n-gram, count shared n-grams per (train, bench) pair, and report
  * the pair with the shared count and the fraction of the benchmark
  * doc's n-grams that leak (`n_shared / n_bench` — the decontamination
  * literature's overlap ratio; thresholding on the BENCH side is what
  * makes the decision independent of training-doc length).
  *
  * Scale posture: the benchmark set is tiny next to a 100 TB training
  * corpus (thousands of eval docs vs billions of training docs), so the
  * bench n-gram table is BROADCAST — the training side is one scan +
  * explode with NO shuffle of training data; the only exchange is the
  * post-join aggregation on (train_id, bench_id), bounded by actual
  * matches, which contamination makes rare by construction. For a
  * benchmark set too large to broadcast, drop the hint and the same
  * plan shuffles both sides on the n-gram — semantics unchanged.
  */
object Contamination {

  /** (train_id, bench_id, n_shared, frac) for every pair sharing at
    * least `minShared` distinct `w`-gram spans; `frac` = n_shared over
    * the benchmark doc's distinct n-gram count (0 < frac ≤ 1).
    *
    * Width guidance: production decontamination uses w in the 8-13
    * range (a 13-gram match is essentially always verbatim leakage;
    * GPT-3/PaLM-era pipelines standardized there). The driver query
    * runs w=3 only because the synthetic corpus contains no planted
    * contamination — at w≥5 it has zero overlapping spans.
    *
    * `multiRowTrainDocs`: dedup is per (doc, n-gram). With one row per
    * training doc (the normal corpus shape — DEFAULT), the per-row
    * `array_distinct` IS that dedup and the post-join count stays a
    * plain map-combined count. Set true when a training doc's text
    * spans several rows: the post-join aggregate switches to
    * countDistinct over the matched postings (measured ~2× the
    * aggregate cost at sf0.1 — only pay it when the shape demands it).
    * The bench side always dedups across rows (broadcast-sized,
    * trivial). */
  def ngramOverlap(train: DataFrame, trainId: Column, trainText: Column,
                   bench: DataFrame, benchId: Column, benchText: Column,
                   w: Int, minShared: Long,
                   multiRowTrainDocs: Boolean = false): DataFrame = {
    // shingling + per-row dedup is the CPU-heavy stage — spread a
    // small/single-split training corpus across cores first (no-op at
    // lake scale where the scan already has enough splits)
    val t = graft.core.Xform.spreadToCores(train)
      .select(trainId.as("train_id"),
        explode(array_distinct(ShingleHashes(tokens(trainText), w)))
          .as("sg"))
    // per-bench distinct n-gram totals ride the SAME deduped rows as a
    // count window (cheap — the bench side is broadcast-sized), so ONE
    // broadcast serves both the match join and the frac denominator;
    // a separate totals table would broadcast-build the bench
    // explode+distinct subtree a second time and pay a second join
    val b = bench.select(benchId.as("bench_id"),
        explode(array_distinct(ShingleHashes(tokens(benchText), w)))
          .as("sg")).distinct()
      .withColumn("n_bench", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bench_id"))))
    val nShared =
      if (multiRowTrainDocs) countDistinct(col("sg")) else count(lit(1))
    t.join(broadcast(b), "sg")
      .groupBy(col("train_id"), col("bench_id"))
      // n_bench is constant within the group — max() just carries it
      .agg(nShared.as("n_shared"), max(col("n_bench")).as("n_bench"))
      .filter(col("n_shared") >= minShared)
      .select(col("train_id"), col("bench_id"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_bench").cast("double")).as("frac"))
  }

  /** The decontamination DECISION: one row per training doc to DROP —
    * its worst leak (max frac, then max n_shared) and how many
    * benchmark docs it clashes with. Anti-joining the training corpus
    * against this id set is the "clean corpus" step. */
  def contaminatedIds(overlap: DataFrame): DataFrame =
    overlap.groupBy(col("train_id"))
      .agg(max(col("frac")).as("worst_frac"),
        max(col("n_shared")).as("max_shared"),
        count(lit(1)).as("n_bench_hit"))

  /** Per-doc n-gram NOVELTY against a reference corpus: the fraction of
    * a doc's distinct w-grams never seen in the reference — the inverse
    * signal of [[ngramOverlap]] (overlap says "too close to the
    * benchmark, drop it"; novelty says "how much of this is new
    * relative to what we already trained on" — the memorization /
    * incremental-value weight a curation pass ranks fresh crawls by).
    *
    * Shape: both sides reduce to 60-bit md5 hashes before any join, so
    * the reference set is a single-column integer table — broadcast at
    * small reference sizes, a plain hash equi-join at lake scale (the
    * decision is Catalyst/AQE's; nothing here forces either). One
    * explode over the scored side, one distinct over the reference, one
    * (doc_id) aggregation. Docs with no w-grams emit no row (nothing to
    * measure — the bigramLmScore rule).
    * Returns (doc_id, n_grams, n_unseen, novelty). */
  def ngramNovelty(docs: DataFrame, id: Column, text: Column,
                   ref: DataFrame, refText: Column, w: Int): DataFrame = {
    val refSet = ref
      .select(explode(array_distinct(ShingleHashes(tokens(refText), w)))
        .as("h")).distinct()
      .withColumn("__seen", lit(true))
    // spread the scored side before its shingle explode (single-split
    // sources would tokenize+hash in one task; no-op at lake scale)
    graft.core.Xform.spreadToCores(docs)
      .select(id.as("doc_id"),
        explode(array_distinct(ShingleHashes(tokens(text), w))).as("h"))
      .join(refSet, Seq("h"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_unseen"))
      .withColumn("novelty",
        col("n_unseen").cast("double") / col("n_grams").cast("double"))
  }

  /** The benchmark's per-doc distinct n-gram HASH arrays (60-bit md5
    * longs — the shared oracle-parity hash) — the static side
    * [[streamingFlags]] broadcasts; build once, reuse per batch.
    * Hashing up front makes the per-pair intersect integer work instead
    * of string hashing, and shrinks the broadcast ~5× vs n-gram text.
    *
    * Dedup is per bench ID, not per input row: a benchmark doc whose
    * text spans several rows still yields ONE (bench_id, bsg) row with
    * the union of its distinct n-grams (matching [[ngramOverlap]]'s
    * bench-side cross-row dedup), so [[streamingFlags]] never emits
    * duplicate pairs with partial counts. The aggregate runs on the
    * broadcast-sized bench table — trivial. */
  def benchNgrams(bench: DataFrame, benchId: Column, benchText: Column,
                  w: Int): DataFrame =
    bench.select(benchId.as("bench_id"),
        array_distinct(ShingleHashes(tokens(benchText), w)).as("bsg0"))
      .groupBy(col("bench_id"))
      .agg(array_distinct(flatten(collect_list(col("bsg0")))).as("bsg"))

  /** INGEST-TIME contamination gate, streaming-safe: flag each arriving
    * doc against the benchmark set with NO state, watermark, or
    * aggregation — a stateless cross join against the broadcast
    * benchmark n-gram arrays plus a per-pair `array_intersect`.
    *
    * ==SMALL-BENCH ONLY — not the default path==
    * The per-doc cost constant is |bench| array intersections, so this
    * form is appropriate ONLY for benchmark sets of at most a few
    * thousand docs where the true append-mode (zero-aggregation) shape
    * is required. For every other use — and for ALL batch
    * decontamination — use [[streamingFlagsPostings]], whose per-doc
    * work is independent of |bench| (that is the 100 TB scale path, and
    * the one the q_contam_postings driver row pins). Kept as a library
    * alternative because no aggregation at all is sometimes worth the
    * |bench| constant in a genuinely unbounded append-mode sink.
    *
    * Because no shuffle or state is involved the same plan runs
    * identically over a batch frame or a `readStream` micro batch (used
    * from `foreachBatch` or directly in append mode).
    * Returns (train_id, bench_id, n_shared) for pairs ≥ minShared. */
  def streamingFlags(docs: DataFrame, id: Column, text: Column,
                     benchNg: DataFrame, w: Int, minShared: Long): DataFrame =
    // batch runs spread the shingle+intersect work across cores;
    // streaming frames pass through spreadToCores untouched, so the
    // batch/micro-batch plan parity StreamingSpec pins is preserved
    graft.core.Xform.spreadToCores(docs).select(id.as("train_id"),
        array_distinct(ShingleHashes(tokens(text), w)).as("dsg"))
      .crossJoin(broadcast(benchNg))
      .select(col("train_id"), col("bench_id"),
        size(array_intersect(col("dsg"), col("bsg"))).cast("long").as("n_shared"))
      .filter(col("n_shared") >= minShared)

  /** Posting-list form of the ingest gate — same pairs as
    * [[streamingFlags]], different cost model: [[streamingFlags]] runs
    * one `array_intersect` per (doc × bench doc), linear in the corpus
    * but with a per-doc constant of |bench| — fine for thousands of
    * eval docs, wrong for a 100k-doc benchmark union. Here each doc's
    * distinct n-gram hashes explode ONCE and hash-join the broadcast
    * (hash → bench_id) POSTINGS table, so per-doc work scales with the
    * doc's n-grams × their actual bench matches, independent of
    * |bench|. Both sides are per-id distinct, so the per-pair count IS
    * the intersect size — [[ContaminationSpec]] property-tests pair-set
    * equality between the two forms.
    *
    * The aggregation makes this batch-shaped: from a stream, call it
    * inside `foreachBatch` (the per-batch aggregate is bounded by the
    * batch's matches); [[streamingFlags]] remains the stateless
    * append-mode form. */
  def streamingFlagsPostings(docs: DataFrame, id: Column, text: Column,
                             benchNg: DataFrame, w: Int, minShared: Long): DataFrame = {
    val postings = benchNg.select(col("bench_id"), explode(col("bsg")).as("h"))
    graft.core.Xform.spreadToCores(docs).select(id.as("train_id"),
        explode(array_distinct(ShingleHashes(tokens(text), w))).as("h"))
      .join(broadcast(postings), "h")
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Longest shared token SPAN per (train, bench) pair — substring-level
    * contamination beyond fixed-width n-gram counting (Lee et al. 2022's
    * shared-span discipline): an 11-token verbatim quote reports as an
    * 11-token span, not as "4 shared 8-grams".
    *
    * Method: POSITIONAL w-gram matches, then diagonal run extension.
    * Both sides explode their w-grams WITH position and md5-hash them;
    * the equi-join on the hash is simultaneously the contamination GATE
    * (only actually-shared w-grams produce rows — never all-pairs; the
    * oracle and PlanSpec pin the equi shape) and the seed set for span
    * extension. A shared span of s tokens appears as s-w+1 consecutive
    * matches on one DIAGONAL (ti - bj constant), so the longest span is
    * found with plain relational ops: group matches by (pair, diagonal),
    * split into consecutive-ti runs with the row_number difference
    * trick, and report max(run length) + w - 1.
    *
    * Cost model at 100 TB: the train side is one scan + positional
    * explode (spread across cores); the bench positional table is
    * broadcast (same small-benchmark premise as [[ngramOverlap]]); the
    * only exchange is the run-grouping window, whose input is the MATCH
    * set — bounded by real contamination, which decontamination makes
    * rare by construction. The per-pair work the two-width "gate then
    * re-scan the pair" design would do is subsumed: extension here costs
    * one window over already-gated rows instead of a second text scan. */
  /** WITHIN-CORPUS substring dedup (Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better", the ExactSubstr
    * discipline): longest shared token span for every document pair
    * sharing at least one w-gram — the operator that catches partially
    * copied articles, syndicated wire stories and template text that
    * document-level MinHash misses and line-level dedup only catches
    * when the copy is line-aligned.
    *
    * Same diagonal-run method as [[sharedSpans]], but the corpus joins
    * ITSELF, so neither side broadcasts. Scale levers:
    *   - singleton pruning: hashes appearing in one doc (the vast
    *     majority of an organic corpus) are dropped before the pair
    *     join — they cannot form a pair;
    *   - a document-frequency CAP (`maxDf`): a w-gram present in more
    *     than maxDf docs is boilerplate, not plagiarism — it belongs to
    *     [[Dedup.lineDedup]]'s regime, and keeping it here would make
    *     the pair join quadratic in its posting length (the classic
    *     hot-shingle skew; RefinedWeb applies exactly this cap). Both
    *     filters ride one hash-keyed aggregate, and the df-gated
    *     posting list then self-joins EQUI on the hash with a.doc <
    *     b.doc — bounded by maxDf² per hash, never all-pairs.
    * The run-grouping window and final per-pair max are sized by actual
    * shared spans. Every exchange is keyed by the hash or the pair. */
  def selfDupSpans(docs: DataFrame, id: Column, text: Column,
                   w: Int, maxDf: Long): DataFrame = {
    // tracked persist: the exploded (doc, pos, hash) table feeds the
    // df-gate aggregate AND the pair self-join — uncached, the raw
    // scan→shingle→md5 subtree (the query's dominant cost) re-runs per
    // consumer. (8B+4B+8B) per token position, far smaller than the text.
    val pos = graft.core.Caches.track(graft.core.Xform.spreadToCores(docs)
      .select(id.as("doc_id"),
        posexplode(ShingleHashes(tokens(text), w)).as(Seq("p", "h"))))
    // pairable hashes: in ≥2 docs (singletons can't pair) and ≤ maxDf
    // (hotter is boilerplate; also bounds join fan-out per hash)
    val pairable = pos.select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select(col("h"))
    val gated = pos.join(pairable, "h")
    val runW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pa"))
    gated.select(col("doc_id").as("doc_a"), col("p").as("pa"), col("h"))
      .join(gated.select(col("doc_id").as("doc_b"), col("p").as("pb"), col("h")), "h")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pa"),
        (col("pa") - col("pb")).as("diag"))
      .withColumn("run", col("pa") - row_number().over(runW))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("run"))
      .agg(count(lit(1)).as("rl"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg((max(col("rl")) + lit(w - 1)).cast("long").as("span_len"))
  }

  def sharedSpans(train: DataFrame, trainId: Column, trainText: Column,
                  bench: DataFrame, benchId: Column, benchText: Column,
                  w: Int): DataFrame = {
    val t = graft.core.Xform.spreadToCores(train)
      .select(trainId.as("train_id"),
        posexplode(ShingleHashes(tokens(trainText), w)).as(Seq("ti", "h")))
    val b = bench
      .select(benchId.as("bench_id"),
        posexplode(ShingleHashes(tokens(benchText), w)).as(Seq("bj", "h")))
    val runW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("train_id"), col("bench_id"), col("diag"))
      .orderBy(col("ti"))
    t.join(broadcast(b), "h")
      .select(col("train_id"), col("bench_id"), col("ti"),
        (col("ti") - col("bj")).as("diag"))
      // consecutive ti's on one diagonal share (ti - row_number): each
      // run is one maximal shared span
      .withColumn("run", col("ti") - row_number().over(runW))
      .groupBy(col("train_id"), col("bench_id"), col("diag"), col("run"))
      .agg(count(lit(1)).as("rl"))
      .groupBy(col("train_id"), col("bench_id"))
      .agg((max(col("rl")) + lit(w - 1)).cast("long").as("span_len"))
  }

  /** Canary-string scan — the memorization probe of a release audit
    * (Carlini et al., USENIX Sec'19 "secret sharer"): planted canary
    * strings must NOT appear in a training corpus; any hit is a
    * leak from a supposedly-excluded source (or an injected canary a
    * scrub pass failed to drop). Exact SUBSTRING containment, not
    * token n-grams: canaries are chosen to be tokenization-proof.
    * Emits one row per (doc, matched canary); an empty result is the
    * healthy state (the q_contam_w8 exact-zero-parity discipline —
    * the adversarial corpus plants a positive).
    *
    * Shape: the |canaries|-row list rides as a generated literal
    * array (kilobytes at any scale); the scan is one zero-shuffle
    * codegen projection — corpus never shuffles. */
  def canaryScan(df: DataFrame, id: Column, text: Column,
                 canaries: Seq[String]): DataFrame = {
    val arr = array(canaries.zipWithIndex.map { case (c, i) =>
      struct(lit(i.toLong).as("cid"), lit(c).as("canary")) }: _*)
    df.filter(text.isNotNull)
      .select(id.as("doc_id"), text.as("__t"), explode(arr).as("c"))
      .filter(col("__t").contains(col("c.canary")))
      .select(col("doc_id"), col("c.cid").as("canary_id"),
        col("c.canary").as("canary"))
  }
}
