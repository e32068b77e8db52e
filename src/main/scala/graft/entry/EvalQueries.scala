package graft.entry

import graft.agg.TimeSeries
import graft.llm.TextAnalysis
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 wave: readability scoring, conditional-bigram-entropy
  * repetitiveness, and CUSUM changepoint detection — plus the
  * retrieval-evaluation / normalization operators that join them in
  * this file. Operators live in [[graft.llm.TextAnalysis]],
  * [[graft.agg.TimeSeries]], [[graft.llm.Selection]] and
  * [[graft.llm.Similarity]]; every quantization/guard embeds
  * token-identically in the DuckDB twins.
  */
object EvalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Flesch reading ease + FK grade — zero-shuffle codegen
    // projection; exact integer word/sentence/vowel-run counts
    "q_readability" -> ((s, d) =>
      TextAnalysis.readability(Tables.documents(s, d), col("doc_id"),
        col("text"))),

    // conditional bigram entropy H(next|current) per doc — the
    // transition-repetitiveness signal; fixed-point ln terms
    "q_bigram_entropy" -> ((s, d) =>
      TextAnalysis.bigramEntropy(Tables.documents(s, d), col("doc_id"),
        col("text"))),

    // CUSUM level-shift changepoint per event type — exact integer
    // argmax of |C_i·n − i·S|, one shuffle + two per-key sorts
    "q_cusum" -> ((s, d) =>
      TimeSeries.cusumChangepoint(Tables.events(s, d), col("event_type"),
        col("ts"), col("event_id"), col("value"))
        .withColumnsRenamed(Map("k" -> "event_type")))
  )

  private val FoldSql = "lower(translate(text, 'İΣ', 'iσ'))"
  private val ToksSql = "list_filter(string_split(text, ' '), t -> len(t) > 0)"
  private val FoldToksSql =
    s"list_filter(string_split($FoldSql, ' '), t -> len(t) > 0)"

  val oracle: Map[String, String] = Map(
    "q_readability" ->
      s"""WITH c AS (SELECT doc_id,
         |  CAST(len($ToksSql) AS BIGINT) AS n_words,
         |  CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
         |    AS n_sentences,
         |  CAST(len(regexp_extract_all($FoldSql, '[aeiouy]+')) AS BIGINT)
         |    AS n_syllables
         |FROM documents)
         |SELECT doc_id, n_words, n_sentences, n_syllables,
         |  CASE WHEN n_words = 0 OR n_sentences = 0 THEN NULL
         |    ELSE 206.835
         |      - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         |      - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
         |  END AS flesch,
         |  CASE WHEN n_words = 0 OR n_sentences = 0 THEN NULL
         |    ELSE 0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         |      + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
         |      - 15.59
         |  END AS fk_grade
         |FROM c""".stripMargin,

    "q_bigram_entropy" ->
      s"""WITH t AS (SELECT doc_id AS doc, $FoldToksSql AS tk FROM documents),
         |b AS (SELECT doc, CAST(len(tk) - 1 AS BIGINT) AS n,
         |        tk[i + 1] AS u, tk[i + 2] AS v
         |      FROM t CROSS JOIN LATERAL unnest(range(0, len(tk) - 1)) AS w(i)
         |      WHERE len(tk) >= 2),
         |cnt AS (SELECT doc, u, v, count(*) AS c_uv, min(n) AS n
         |        FROM b GROUP BY 1, 2, 3),
         |cu AS (SELECT doc, n, c_uv,
         |         CAST(sum(c_uv) OVER (PARTITION BY doc, u) AS BIGINT) AS c_u
         |       FROM cnt),
         |tt AS (SELECT doc, n, c_uv,
         |         CAST(floor(CAST(c_uv AS DOUBLE) / CAST(n AS DOUBLE)
         |           * ln(CAST(c_u AS DOUBLE) / CAST(c_uv AS DOUBLE))
         |           * 1.0E9) AS BIGINT) AS tq
         |       FROM cu)
         |SELECT doc AS doc_id, min(n) AS n_bigrams,
         |  count(*) AS n_distinct_bigrams,
         |  CAST(CAST(sum(tq) AS BIGINT) AS DOUBLE) / 1.0E9 AS bigram_entropy
         |FROM tt GROUP BY doc""".stripMargin,

    "q_cusum" ->
      """WITH v AS (SELECT event_type AS k, epoch_us(ts) AS t, event_id AS id,
        |             CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |           FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |w AS (SELECT k, t, id, c,
        |        CAST(row_number() OVER (PARTITION BY k ORDER BY t, id)
        |          AS BIGINT) AS i,
        |        CAST(sum(c) OVER (PARTITION BY k ORDER BY t, id
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ci,
        |        CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
        |        CAST(sum(c) OVER (PARTITION BY k) AS BIGINT) AS s
        |      FROM v),
        |d AS (SELECT k, t, id, i, ci, n, s,
        |        abs(CAST(ci AS DECIMAL(38,0)) * n
        |          - CAST(i AS DECIMAL(38,0)) * s) AS dnum
        |      FROM w),
        |r AS (SELECT *, row_number() OVER (PARTITION BY k
        |        ORDER BY dnum DESC, t, id) AS rk FROM d)
        |SELECT k AS event_type, n, t AS cp_t, i AS cp_index,
        |  CAST(dnum AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0) AS max_drift,
        |  CAST(ci AS DOUBLE) / CAST(i AS DOUBLE) / 100.0 AS mean_left,
        |  CASE WHEN i = n THEN NULL
        |    ELSE CAST(s - ci AS DOUBLE) / CAST(n - i AS DOUBLE) / 100.0
        |  END AS mean_right
        |FROM r WHERE rk = 1""".stripMargin
  )
}
