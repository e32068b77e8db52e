package graft.entry

import graft.llm.Urls
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL/domain-level curation queries — the step-zero family of every
  * web-scale pipeline (C4 §2.1, RefinedWeb §3.1 run URL filtering before
  * any text operator). The reference engine has no URL surface (its corpus
  * enters via Kafka topics — reference: src/kafka_streams_clojure/api.clj:57),
  * so this is driver-mandated extension surface; operators live in
  * [[graft.llm.Urls]].
  *
  * The driver's `documents` table carries no URL column, so both engines
  * DERIVE one deterministic URL per doc from `doc_id` residues — the same
  * shared-formula discipline the media queries use for payload bytes. The
  * formula is adversarial by construction: mixed-case scheme/host, userinfo,
  * default and explicit ports, a two-level public suffix (co.uk), a
  * single-label host, leading/lone utm params, fragments, trailing slashes,
  * and residue collisions so canonicalize-then-dedup genuinely collapses
  * (scheme case, :443, #frag, ?utm_ variants all map distinct raw URLs to
  * one canonical form).
  */
object UrlQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Registered domains the blocklist filter drops — includes the
    * single-label host and NOT bbc.co.uk, so the suffix-vs-domain
    * distinction is exercised (a co.uk host must survive unless its
    * registered domain is listed). */
  private val Blocklist = Seq("badsite.net", "localhost")

  /** Per-domain cap + its deterministic-order salt (q_domain_cap). */
  private val DomainCap = 4; private val DomainCapSalt = 5

  /** Deterministic per-doc URL from doc_id residues (Spark half; the
    * oracle CTE in [[oracle]] mirrors it term for term). */
  private def urlCol: Column = {
    val m = col("doc_id")
    val host = when(m % 6 === 0, lit("www.example.com"))
      .when(m % 6 === 1, lit("News.BBC.co.uk"))
      .when(m % 6 === 2, concat(lit("cdn"), (m % 3).cast("string"), lit(".Example.com")))
      .when(m % 6 === 3, lit("blog.example.org"))
      .when(m % 6 === 4, concat(lit("spam-"), (m % 2).cast("string"), lit(".badsite.net")))
      .otherwise(lit("localhost"))
    concat(
      when(m % 2 === 0, lit("https")).otherwise(lit("HTTPS")), lit("://"),
      when(m % 7 === 0, lit("user:pw@")).otherwise(lit("")),
      host,
      when(m % 5 === 0, lit(":443")).when(m % 5 === 1, lit(":8080")).otherwise(lit("")),
      lit("/Page/"), (m % 7).cast("string"),
      when(m % 3 === 0, lit("/")).otherwise(lit("")),
      when(m % 4 === 0, concat(lit("?utm_source=feed&id="), (m % 7).cast("string")))
        .when(m % 4 === 1, concat(lit("?id="), (m % 7).cast("string")))
        .when(m % 4 === 2, lit("?utm_campaign=news"))
        .otherwise(lit("")),
      when(m % 3 === 1, lit("#sec")).otherwise(lit("")))
  }

  private def docsWithUrl(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).withColumn("url", urlCol)

  val queries: Map[String, Q] = Map(
    // host + registered-domain extraction over every URL shape — pure
    // codegen projection, zero shuffles
    "q_url_parse" -> ((s, d) => {
      val host = Urls.hostOf(col("url"))
      docsWithUrl(s, d).select(col("doc_id"), col("url"), host.as("host"),
        Urls.registeredDomain(host).as("reg_domain"))
    }),

    // C4-style canonicalization — frag/case/port/utm/trailing-slash passes
    "q_url_canon" -> ((s, d) => docsWithUrl(s, d).select(col("doc_id"),
      col("url"), Urls.canonicalizeUrl(col("url")).as("url_canon"))),

    // per-registered-domain rollup: one hash shuffle, two-phase
    // count-distincts
    "q_url_stats" -> ((s, d) =>
      Urls.domainStats(docsWithUrl(s, d), col("doc_id"), col("url"), col("lang"))),

    // broadcast blocklist anti-join — the fact side never shuffles
    "q_url_filter" -> ((s, d) =>
      Urls.blocklistFilter(docsWithUrl(s, d), col("doc_id"), col("url"), Blocklist)),

    // canonicalize-then-dedup: distinct raw variants collapse to one
    // canonical URL; keep lowest id, count the collapse
    "q_url_dedup" -> ((s, d) =>
      Urls.urlDedup(docsWithUrl(s, d), col("doc_id"), col("url"))),

    // structural quality gates (path depth, query params, media
    // extension, length) — pure projection, zero shuffles
    "q_url_quality" -> ((s, d) =>
      Urls.urlQuality(docsWithUrl(s, d), col("doc_id"), col("url"))),

    // per-registered-domain cap sampling (the Common-Crawl mega-domain
    // guard): keep <= 4 docs/domain by salted content-hash order —
    // one partitioned window, reshard-stable
    "q_domain_cap" -> ((s, d) =>
      Urls.domainCap(docsWithUrl(s, d), col("doc_id"), col("url"),
        col("text"), DomainCap, DomainCapSalt))
  )

  // ====================================================================
  // DuckDB oracle twins. regexp_replace carries the 'g' flag wherever
  // Spark's replaceAll semantics could see a second match; regexes are in
  // the shared Java∩RE2 subset (the PII-scrub discipline).
  // ====================================================================

  /** The url-derivation CTE both oracles start from — mirrors [[urlCol]]. */
  private val UrlCte =
    """WITH u AS (
      |  SELECT doc_id, lang, text,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END) || '://' ||
      |    (CASE WHEN doc_id % 7 = 0 THEN 'user:pw@' ELSE '' END) ||
      |    (CASE doc_id % 6
      |       WHEN 0 THEN 'www.example.com'
      |       WHEN 1 THEN 'News.BBC.co.uk'
      |       WHEN 2 THEN 'cdn' || CAST(doc_id % 3 AS VARCHAR) || '.Example.com'
      |       WHEN 3 THEN 'blog.example.org'
      |       WHEN 4 THEN 'spam-' || CAST(doc_id % 2 AS VARCHAR) || '.badsite.net'
      |       ELSE 'localhost' END) ||
      |    (CASE doc_id % 5 WHEN 0 THEN ':443' WHEN 1 THEN ':8080' ELSE '' END) ||
      |    '/Page/' || CAST(doc_id % 7 AS VARCHAR) ||
      |    (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END) ||
      |    (CASE doc_id % 4
      |       WHEN 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR)
      |       WHEN 1 THEN '?id=' || CAST(doc_id % 7 AS VARCHAR)
      |       WHEN 2 THEN '?utm_campaign=news' ELSE '' END) ||
      |    (CASE WHEN doc_id % 3 = 1 THEN '#sec' ELSE '' END) AS url
      |  FROM documents)""".stripMargin

  /** Host extraction — [[Urls.HostRe]] verbatim. */
  private val HostSql =
    s"regexp_extract(lower(url), '${Urls.HostRe}', 1)"

  /** Registered domain: 3-label form when the last two labels are a
    * recognized two-level suffix, else last two labels, else the host
    * itself (single label). Semantics of [[Urls.registeredDomain]]
    * expressed as anchored regexes. */
  private def regDomainSql(host: String): String = {
    val suf = Urls.TwoLevelSuffixes.map(_.replace(".", "\\.")).mkString("|")
    s"""coalesce(
       |  nullif(regexp_extract($host, '([^.]+\\.(?:$suf))$$', 1), ''),
       |  nullif(regexp_extract($host, '([^.]+\\.[^.]+)$$', 1), ''),
       |  $host)""".stripMargin
  }

  /** Canonicalization pass chain of [[Urls.canonicalizeUrl]]. Emits a CTE
    * `c(doc_id, url, url_canon)` given the `u` CTE in scope. */
  private val CanonCte =
    """c AS (
      |  SELECT doc_id, url,
      |    regexp_replace(url, '#.*$', '', 'g') AS nofrag,
      |    regexp_extract(regexp_replace(url, '#.*$', '', 'g'),
      |                   '^([^/?#]*//[^/?#]*)', 1) AS pfx
      |  FROM u),
      |c2 AS (
      |  SELECT doc_id, url,
      |    regexp_replace(lower(pfx), ':(443|80)$', '', 'g') AS cpfx,
      |    substring(nofrag, length(pfx) + 1, 1000000) AS rest
      |  FROM c),
      |c3 AS (
      |  SELECT doc_id, url, cpfx,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(rest, '\?utm_[^&#]*&', '?', 'g'),
      |        '&utm_[^&#]*', '', 'g'),
      |      '\?utm_[^&#]*$', '', 'g') AS q3
      |  FROM c2),
      |canon AS (
      |  SELECT doc_id, url,
      |    cpfx || regexp_replace(q3, '/$', '', 'g') AS url_canon
      |  FROM c3)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_url_parse" ->
      s"""$UrlCte,
         |h AS (SELECT doc_id, url, $HostSql AS host FROM u)
         |SELECT doc_id, url, host, ${regDomainSql("host")} AS reg_domain
         |FROM h""".stripMargin,

    "q_url_canon" ->
      s"""$UrlCte,
         |$CanonCte
         |SELECT doc_id, url, url_canon FROM canon""".stripMargin,

    "q_url_stats" ->
      s"""$UrlCte,
         |h AS (SELECT doc_id, lang, $HostSql AS host FROM u),
         |r AS (SELECT doc_id, lang, host, ${regDomainSql("host")} AS reg_domain FROM h)
         |SELECT reg_domain, count(*) AS n_urls,
         |       count(DISTINCT host) AS n_hosts,
         |       count(DISTINCT lang) AS n_langs,
         |       min(doc_id) AS first_doc
         |FROM r GROUP BY reg_domain""".stripMargin,

    "q_url_filter" ->
      s"""$UrlCte,
         |$CanonCte,
         |h AS (SELECT doc_id, url, $HostSql AS host FROM u),
         |r AS (SELECT doc_id, url, ${regDomainSql("host")} AS reg_domain FROM h)
         |SELECT r.doc_id, r.url, canon.url_canon, r.reg_domain
         |FROM r JOIN canon ON r.doc_id = canon.doc_id
         |WHERE r.reg_domain NOT IN (${Blocklist.map(b => s"'$b'").mkString(", ")})""".stripMargin,

    "q_url_dedup" ->
      s"""$UrlCte,
         |$CanonCte
         |SELECT url_canon, min(doc_id) AS keep_id,
         |       CAST(count(*) AS BIGINT) AS n_dups
         |FROM canon GROUP BY url_canon""".stripMargin,

    "q_url_quality" ->
      s"""$UrlCte,
         |pq AS (
         |  SELECT doc_id, url,
         |    regexp_extract(url, '^[^/?#]*//[^/?#]*([^?#]*)', 1) AS path,
         |    regexp_extract(url, '\\?([^#]*)', 1) AS query
         |  FROM u)
         |SELECT doc_id, url,
         |  CAST(len(list_filter(string_split(path, '/'), s -> len(s) > 0))
         |       AS BIGINT) AS path_depth,
         |  CAST(CASE WHEN query = '' THEN 0
         |       ELSE len(string_split(query, '&')) END AS BIGINT) AS n_params,
         |  regexp_matches(lower(path),
         |    '\\.(jpe?g|png|gif|svg|ico|css|js|mp4|webm)$$') AS is_media,
         |  CAST(len(url) AS BIGINT) AS url_len
         |FROM pq""".stripMargin,

    "q_domain_cap" ->
      s"""$UrlCte,
         |h AS (SELECT doc_id, text, $HostSql AS host FROM u),
         |r AS (SELECT doc_id, text, ${regDomainSql("host")} AS reg_domain
         |      FROM h),
         |k AS (SELECT doc_id, reg_domain, row_number() OVER (
         |        PARTITION BY reg_domain
         |        ORDER BY CAST('0x'||substring(md5('$DomainCapSalt|' || text),1,15)
         |                 AS BIGINT) ASC NULLS LAST, doc_id) AS rn
         |      FROM r)
         |SELECT doc_id, reg_domain, CAST(rn AS BIGINT) AS domain_rank
         |FROM k WHERE rn <= $DomainCap""".stripMargin
  )
}
