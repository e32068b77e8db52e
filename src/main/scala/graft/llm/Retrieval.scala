package graft.llm

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse retrieval over a document corpus — BM25 ranking and corpus
  * n-gram statistics. Complements the dense path (Similarity): real
  * training-data and RAG pipelines run BOTH a lexical and an embedding
  * retriever and fuse the results.
  *
  * Scale posture: everything is the standard two-shuffle corpus-stats
  * pipeline (explode → hash agg → term-keyed join), the same shape as
  * [[TextAnalysis.tfIdfTopTerms]]; nothing is collected and no operator
  * is quadratic in corpus size. Top-k cuts compile to
  * TakeOrderedAndProject (a per-partition heap + driver merge of k
  * rows), never a global sort.
  */
object Retrieval {

  /** Fixed-point quantization step for BM25 partial scores: 10^9 keeps
    * nine fractional digits of the log-IDF score — far below any rank
    * gap BM25 produces in practice — while fitting |score|·10^9 well
    * inside a LONG. */
  val Bm25Scale: Double = 1e9

  /** Driver-side twin of [[TextAnalysis.foldLower]]
    * (`lower(translate(text, "İΣ", "iσ"))`): İ (U+0130) and Σ map first
    * so Java's locale lowercase can't diverge from DuckDB's
    * simple-mapping lower(). Query terms fold through this so a
    * mixed-case term (e.g. "The") matches the folded token stream
    * instead of silently scoring 0. FoldParitySpec pins the equivalence
    * against the Column form. */
  def foldLowerStr(s: String): String =
    s.replace('İ', 'i').replace('Σ', 'σ')
      .toLowerCase(java.util.Locale.ROOT)

  /** BM25 (Robertson–Sparck Jones) relevance of every document against a
    * bag of query terms; emits the top-k (doc_id, bm25) with ties broken
    * by doc_id.
    *
    * True log-IDF BM25: score(d) = Σ_t ln(1 + (N − df + 0.5)/(df + 0.5))
    * · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) — the Lucene/ATIRE
    * non-negative IDF variant (the +1 keeps stopword terms with
    * df > N/2 from going negative and inverting ranking). An earlier
    * revision dropped the log entirely (rational IDF), but monotone
    * transforms don't commute with the per-term SUM, so multi-term
    * rankings could diverge from real BM25 — the log stays.
    *
    * Oracle-parity choices:
    *  - libm vs Math.log can differ in the last ulp, so each per-term
    *    partial is QUANTIZED to fixed point (floor(s·10^9) as LONG, the
    *    pageRank trick) and the per-document score sums those LONGs in
    *    FIXED literal order — integer adds, bit-reproducible, never a
    *    cross-row double SUM. Sub-10^-9 score gaps (and the
    *    astronomically unlikely ulp-at-a-floor-boundary flip) are the
    *    documented tolerance.
    *  - avgdl is sum(dl)/N with dl summed as LONG (order-independent),
    *    divided once — bit-reproducible.
    *  - tokens and QUERY TERMS both fold through the same İ/Σ-safe
    *    lowercase ([[TextAnalysis.foldLower]] / [[foldLowerStr]]), so
    *    İ/Σ docs match DuckDB and mixed-case query terms still match.
    *    Terms that collide after folding are deduplicated (a repeated
    *    query term does not double-count).
    *
    * Plan shape — SCAN, not postings: the query-term set is a fixed
    * small literal list, so per-document term frequencies are K
    * conditional counts over the folded token array computed in the
    * tokenize scan itself, cached as (doc_id, dl, tf_0..tf_{K-1}) —
    * K+2 longs per doc. Document frequencies and N/Σdl then reduce to
    * ONE 1-row broadcast aggregate over that cache, and scoring is a
    * second scan of it: zero corpus shuffles, two jobs total (the
    * earlier postings form — explode→filter→tf/df aggregations→three
    * joins — paid five jobs of which three were broadcast builds; same
    * results). The trade: per-token work is O(K), so a workload with
    * thousands of query terms wants the postings/inverted-index form —
    * that regime is [[graft.llm.TextAnalysis.tfIdfTopTerms]]'s shape; here K is query-bag-sized. */
  def bm25(df: DataFrame, id: Column, text: Column, queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val terms = queryTerms.map(foldLowerStr).distinct
    val tk = tokens(text)
    val ft = tokensFolded(text)
    // tokenize ONCE (tracked persist): the stats aggregate and the
    // scoring scan both read the tiny per-doc count table
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(ft, x => x === lit(t))).cast("long").as(s"tf_$i") }
    val perDoc = graft.core.Caches.track(
      graft.core.Xform.spreadToCores(df).select(
        id.as("doc_id") +: size(tk).cast("long").as("dl") +: tfCols: _*))
    // N, Σdl and every per-term df in ONE lazy 1-row broadcast (an
    // eager count() here would scan the corpus at plan-construction)
    val statCols =
      count(lit(1)).cast("double").as("n_docs") +:
      sum(col("dl")).cast("double").as("sum_dl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L))
          .cast("double").as(s"df_$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    // per-term quantized partials in FIXED literal order; a tf of 0
    // yields sq = 0, exactly the postings form's absent-row COALESCE
    val sqs = terms.indices.map { i =>
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$i") + lit(0.5)) /
        (col(s"df_$i") + lit(0.5)))
      val num = col(s"tf_$i").cast("double") * lit(k1 + 1.0)
      val den = col(s"tf_$i").cast("double") + lit(k1) *
        (lit(1.0 - b) + (lit(b) * col("dl").cast("double")) /
          (col("sum_dl") / col("n_docs")))
      floor(idf * num / den * lit(Bm25Scale)).cast("long")
    }
    perDoc.crossJoin(broadcast(stats))
      // only docs containing at least one query term rank — the
      // postings form never emitted rows for the rest
      .filter(terms.indices.map(i => col(s"tf_$i")).reduce(_ + _) > 0)
      .select(col("doc_id"),
        (sqs.reduce(_ + _).cast("double") / lit(Bm25Scale)).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** Corpus n-gram counts: the top-k most frequent token n-grams (ties
    * broken by the n-gram string). The language-model-statistics op —
    * n-gram tables feed contamination checks, repetition analysis and
    * classic LM baselines. One explode + one hash aggregation (partial
    * map-side combine) + TakeOrderedAndProject; n-grams come from the
    * native single-pass [[graft.functions.Shingles]] over raw tokens
    * (identical split on both engines, no case folding). */
  def ngramCounts(df: DataFrame, text: Column, n: Int, topK: Int): DataFrame =
    df.select(explode(shingles(text, n)).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(topK)

  /** Bigram language-model quality score — the CCNet-style perplexity
    * proxy for corpus curation: score every document by the mean
    * Laplace-smoothed bigram log-probability under counts trained on
    * the corpus itself,
    *   score(d) = mean over bigrams (w1 w2) of
    *              ln((c(w1 w2) + 1) / (c(w1) + V)),
    * where V is the unigram vocabulary size. Repetitive/templated text
    * scores high, token soup scores low; curation cuts a quantile (pair
    * with [[TextAnalysis]]'s percentile machinery). To score against a
    * REFERENCE corpus (true CCNet), train the count tables on that
    * corpus and join the target's bigrams — the plan shape is identical.
    *
    * Scale posture: the two count tables are classic explode → hash-agg
    * (map-side combine); the scoring side shuffles on the bigram and
    * first-token keys — the standard distributed LM-training shape;
    * nothing collects, V is a 1-row lazy broadcast.
    *
    * Determinism: ln() partials are quantized to fixed-point LONGs
    * (floor(x·10^9), the BM25/pageRank discipline) so the cross-row sum
    * is integer math — order-independent, bit-reproducible, and immune
    * to libm-vs-JVM last-ulp drift. Docs with < 2 tokens have no
    * bigrams and emit no row (nothing to score).
    *
    * Returns (doc_id, n_bigrams, lm_score). */
  def bigramLmScore(df: DataFrame, id: Column, text: Column): DataFrame =
    bigramLmScoreRef(df, df, id, text)

  /** The true-CCNet shape of [[bigramLmScore]]: bigram/unigram counts
    * train on a REFERENCE corpus (`ref` — Wikipedia in CCNet), the
    * TARGET corpus is scored against them. Self-training is the
    * `ref eq target` special case above. Target bigrams/first-tokens
    * unseen in the reference fall back to count 0 via left joins +
    * coalesce — exactly the Laplace prior ln(1/(0+V)): for a self-
    * trained run every count exists, so the left joins degrade to the
    * inner-join plan. Plan shape is otherwise identical (two explode →
    * hash-agg count tables on the REFERENCE, target bigrams shuffle on
    * the bigram and first-token keys).
    *
    * Returns (doc_id, n_bigrams, lm_score) for target docs with ≥ 1
    * bigram. */
  def bigramLmScoreRef(ref: DataFrame, target: DataFrame,
                       id: Column, text: Column): DataFrame = {
    // refToks/bg each feed two consumers, but deliberately NOT
    // persisted: the exploded token/bigram streams are LARGER than the
    // parent columnar scan they derive from, so materializing them
    // costs more than recomputing (measured 0.83 s unpersisted vs
    // 1.34 s persisted at sf0.1 — the opposite trade from bm25/tfidf,
    // whose cached posting lists are smaller than their scan)
    // refToks deliberately NOT spread across cores (unlike bm25): it
    // feeds two unpersisted consumers, so a pre-tokenize repartition
    // would re-shuffle per consumer and cost more than it parallelizes
    // (measured +0.6 s at sf0.1); the count shuffles right below
    // already redistribute
    val refToks = ref.select(tokens(text).as("tk"))
    val c1 = refToks.select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val vocab = c1.agg(count(lit(1)).cast("double").as("v"))
    val c2 = refToks.select(explode(Shingles2(col("tk"))).as("bg2"))
      .groupBy(col("bg2")).agg(count(lit(1)).as("c2"))
    val bg = target.select(id.as("doc_id"),
        explode(Shingles2(tokens(text))).as("bg"))
      .select(col("doc_id"), col("bg"),
        substring_index(col("bg"), " ", 1).as("w1"))
    bg.join(c2, col("bg") === col("bg2"), "left")
      .join(c1, col("w1") === col("w"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        floor(log((coalesce(col("c2"), lit(0L)).cast("double") + lit(1.0)) /
          (coalesce(col("c1"), lit(0L)).cast("double") + col("v"))) * lit(Bm25Scale))
          .cast("long").as("q"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        ((sum(col("q")).cast("double") / lit(Bm25Scale)) /
          count(lit(1)).cast("double")).as("lm_score"))
  }

  /** CCNet perplexity buckets (Wenzek et al., arXiv:1911.00359 §4.3):
    * per LANGUAGE, split the corpus into head / middle / tail terciles
    * by LM score — CCNet's standard quality strata (head = lowest
    * perplexity ≙ highest mean log-prob here; downstream pipelines
    * train on head+middle and sample the tail). Buckets come from pure
    * integer math over a deterministic ranking — `(3·(rn−1)) div n`
    * with rn ordered by (lm_score DESC, doc_id) — NOT ntile(), whose
    * remainder-distribution rule would have to be trusted to match
    * across engines; the div form is the same integer op on both.
    *
    * Plan shape: [[bigramLmScore]]'s two count aggregates + score
    * shuffle, one broadcast-sized join back to (doc_id, lang), and one
    * window shuffle on lang. Docs with a NULL language or < 2 tokens
    * carry no signal and emit no row (mirrored by the oracle's joins).
    * Returns (doc_id, lang, lm_score, bucket).
    *
    * SCALE caveat: the per-language row_number is a total sort of each
    * language partition — exact (and oracle-mirrorable), but a 100 TB
    * corpus with a dominant language makes that one sorted partition
    * the straggler. At lake scale use [[perplexityBucketsApprox]]:
    * same strata from mergeable quantile-sketch cut points, no
    * per-language sort anywhere. */
  def perplexityBuckets(df: DataFrame, id: Column, text: Column,
                        lang: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = bigramLmScore(df, id, text)
    val w = Window.partitionBy(col("lang"))
    val wO = w.orderBy(col("lm_score").desc, col("doc_id"))
    df.select(id.as("doc_id"), lang.as("lang"))
      .filter(col("lang").isNotNull)
      .join(scored, "doc_id")
      .withColumn("rn", row_number().over(wO))
      .withColumn("n", count(lit(1)).over(w))
      .select(col("doc_id"), col("lang"), col("lm_score"),
        // 64-bit multiply: row_number is IntegerType, and 3*(rn-1) wraps
        // 32-bit for a language partition above ~715M docs — the oracle
        // computes the same expression in BIGINT, so match its width
        when(expr("(3 * cast(rn - 1 as bigint)) div n") === 0, lit("head"))
          .when(expr("(3 * cast(rn - 1 as bigint)) div n") === 1, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** The 100 TB form of [[perplexityBuckets]]: tercile CUT POINTS from
    * `percentile_approx` (a mergeable quantile sketch — map-side
    * combined, one small aggregate, NO per-language sort), broadcast
    * back onto the scored stream as a threshold projection. Strata
    * boundaries are approximate (sketch `accuracy` trades memory for
    * rank error — the CCNet use case only needs "roughly thirds"), so
    * this is the library scale path, not an oracle-matched query; the
    * exact windowed form remains the correctness-gated twin. */
  def perplexityBucketsApprox(df: DataFrame, id: Column, text: Column,
                              lang: Column,
                              accuracy: Int = 10000): DataFrame = {
    val scored = df.select(id.as("doc_id"), lang.as("lang"))
      .filter(col("lang").isNotNull)
      .join(bigramLmScore(df, id, text), "doc_id")
    val cuts = scored.groupBy(col("lang"))
      .agg(percentile_approx(col("lm_score"),
        array(lit(1.0 / 3), lit(2.0 / 3)), lit(accuracy)).as("cuts"))
    scored.join(broadcast(cuts), "lang")
      .select(col("doc_id"), col("lang"), col("lm_score"),
        when(col("lm_score") >= element_at(col("cuts"), 2), lit("head"))
          .when(col("lm_score") >= element_at(col("cuts"), 1), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) of
    * two ranked retrieval lists — THE standard hybrid-retrieval merge
    * (lexical BM25 + dense ANN) for RAG corpora: score(d) =
    * Σ_lists 1/(k + rank_d), absent-list membership contributes 0.
    *
    * Inputs are (doc_id, rank) frames with 1-based ranks. Both are
    * top-K slices (tens of rows), so the fusion is a broadcast-sized
    * full-outer join and a TakeOrderedAndProject — no corpus shuffle
    * anywhere; the expensive work stays inside the two upstream
    * retrievers, which at lake scale are the already-indexed BM25
    * postings and ANN probes. Determinism: 1.0/(k+rank) is a single
    * IEEE division of small-integer operands (bit-identical across
    * engines), the two-term sum has fixed literal order, ties break on
    * doc_id. */
  def rrfFuse(lex: DataFrame, dense: DataFrame,
              kConst: Int = 60, topK: Int = 10): DataFrame = {
    val a = lex.select(col("doc_id"), col("rank").cast("long").as("rank_lex"))
    val b = dense.select(col("doc_id"), col("rank").cast("long").as("rank_dense"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_lex"), col("rank_dense"),
        (coalesce(lit(1.0) / (lit(kConst.toLong) + col("rank_lex")).cast("double"), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kConst.toLong) + col("rank_dense")).cast("double"), lit(0.0)))
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(topK)
  }

  /** Attach a 1-based dense rank column to a ranked top-K slice:
    * row_number over (score desc, doc_id) — the slice is already
    * top-K-sized, so the single-partition window is bounded by K, not
    * the corpus. */
  def withRank(topk: DataFrame, score: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    topk.withColumn("rank",
      row_number().over(Window.orderBy(score.desc, col("doc_id"))).cast("long"))
  }

  /** Bigram shingles over a pre-tokenized array (w = 2). */
  private def Shingles2(tk: Column): Column =
    graft.functions.Shingles(tk, 2)
}
