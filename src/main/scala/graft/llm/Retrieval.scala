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

  /** BM25 (Robertson–Sparck Jones) relevance of every document against a
    * bag of query terms; emits the top-k (doc_id, bm25) with ties broken
    * by doc_id.
    *
    * Oracle-parity choices:
    *  - IDF uses the RATIONAL form (N − df + 0.5)/(df + 0.5) WITHOUT the
    *    log wrap: libm vs Math.log differ in the last ulp while +,−,×,÷
    *    are IEEE-correctly-rounded on both engines, and log is monotone
    *    so rankings are identical (same trick as tfIdfTopTerms).
    *  - avgdl is sum(dl)/N with dl summed as LONG (order-independent),
    *    divided once — bit-reproducible.
    *  - the per-document score sums its query-term partials in FIXED
    *    literal order (one conditional max per term, added left to
    *    right) — never a cross-row double SUM, whose partial-agg order
    *    would break the hash match.
    *  - terms are folded with [[TextAnalysis.foldLower]] so İ/Σ docs
    *    match DuckDB's simple-mapping lower().
    */
  def bm25(df: DataFrame, id: Column, text: Column, queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val toks = df.select(id.as("doc_id"), tokens(text).as("tk"))
    val dl = toks.select(col("doc_id"), size(col("tk")).cast("long").as("dl"))
    val tok = toks.select(col("doc_id"),
        explode(transform(col("tk"), t => TextAnalysis.foldLower(t))).as("term"))
      // filter BEFORE the aggregation: only query-term postings shuffle
      .filter(col("term").isin(queryTerms: _*))
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // df = tf's row count per term (tf is one row per (doc, term))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // N and Σdl as a LAZY 1-row broadcast (an eager count() here would
    // scan the corpus at query-construction time)
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      sum(col("dl")).cast("double").as("sum_dl"))
    val idf = (col("n_docs") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val num = col("tf").cast("double") * lit(k1 + 1.0)
    val den = col("tf").cast("double") + lit(k1) *
      (lit(1.0 - b) + (lit(b) * col("dl").cast("double")) /
        (col("sum_dl") / col("n_docs")))
    val scored = tf.join(dfreq, "term").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), (idf * num / den).as("s"))
    val total = queryTerms
      .map(t => coalesce(max(when(col("term") === t, col("s"))), lit(0.0)))
      .reduce(_ + _)
    scored.groupBy(col("doc_id"))
      .agg(total.as("bm25"))
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
}
