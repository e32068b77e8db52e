package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain-level curation — step zero of every web-scale pipeline
  * (C4, RefinedWeb, Gopher all filter on URL before any text operator):
  * host extraction, registered-domain rollup, domain-blocklist removal,
  * and canonicalize-then-dedup. The reference engine has no URL surface
  * (its corpus enters via Kafka topics — kafka_streams_clojure/api.clj:53
  * TODO-lists even joins), so this family is driver-mandated extension
  * surface, built to the 100 TB shapes:
  *
  *  - everything here except the rollup/dedup aggregations is a pure
  *    codegen projection (regexp/string ops) — runs at scan speed,
  *    zero shuffles;
  *  - the blocklist is a small dim by construction (thousands of
  *    domains vs billions of docs) → broadcast anti-join, never a
  *    shuffle of the fact side;
  *  - the rollup and the canonical-URL dedup are each ONE hash shuffle
  *    with map-side partial aggregation.
  *
  * All string surgery lives in the Java∩RE2 regex subset (the PII-scrub
  * discipline, TextAnalysis.piiScrub) so the DuckDB oracle replays the
  * identical passes.
  */
object Urls {

  /** Two-level public suffixes the registered-domain rule recognizes.
    * A real deployment loads the full Mozilla public-suffix list as a
    * broadcast lookup; a fixed subset keeps the operator (and its
    * oracle) self-contained while exercising the 3-label branch. */
  val TwoLevelSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "co.jp", "com.au", "co.in")

  /** Lowercased host from a URL: the authority minus userinfo and port.
    * Empty string when the input has no `scheme://` authority (regexp
    * no-match — both engines return '' rather than NULL). */
  def hostOf(url: Column): Column =
    regexp_extract(lower(url), HostRe, 1)

  /** Host-extraction regex (group 1 = host) — shared with the oracle. */
  val HostRe = "^[^/?#]*//(?:[^/@?#]*@)?([^/:?#]+)"

  /** Registered (pay-level) domain of a host: the last two labels, or
    * the last three when the trailing two form a recognized two-level
    * public suffix ("bbc.co.uk", not "co.uk"). Single-label hosts pass
    * through unchanged. Pure slice/join on the label array — codegen. */
  def registeredDomain(host: Column): Column = {
    val ls = split(host, "\\.")
    val n = size(ls)
    val last2 = array_join(slice(ls, greatest(n - 1, lit(1)), lit(2)), ".")
    when(n >= 3 && last2.isin(TwoLevelSuffixes: _*),
      array_join(slice(ls, n - 2, lit(3)), "."))
      .otherwise(last2)
  }

  /** Canonical URL — the C4-style normalization under which "the same
    * page" compares equal:
    *   1. drop the fragment;
    *   2. lowercase scheme+authority (path/query stay case-sensitive);
    *   3. drop default ports (:443, :80);
    *   4. drop utm_* tracking params (leading `?utm_x&` → `?`, then any
    *      `&utm_x`, then a lone trailing `?utm_x`);
    *   5. drop one trailing slash.
    * Every pass is a regexp in the shared Java∩RE2 subset; adjacent
    * leading utm params (`?utm_a&utm_b&id=1`) need one pass per param —
    * a documented bound, identical on both engines. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // scheme://host[:port] prefix vs the path?query remainder: only the
    // prefix is case-folded and port-stripped
    val prefix = regexp_extract(noFrag, "^([^/?#]*//[^/?#]*)", 1)
    val rest = substr(noFrag, length(prefix) + 1, length(noFrag))
    val cPrefix = regexp_replace(lower(prefix), ":(443|80)$", "")
    val q1 = regexp_replace(rest, "\\?utm_[^&#]*&", "?")
    val q2 = regexp_replace(q1, "&utm_[^&#]*", "")
    val q3 = regexp_replace(q2, "\\?utm_[^&#]*$", "")
    concat(cPrefix, regexp_replace(q3, "/$", ""))
  }

  /** Path component of a URL (between authority and ?/#): '' when the
    * input has no `scheme://` authority or no path. */
  def pathOf(url: Column): Column =
    regexp_extract(url, "^[^/?#]*//[^/?#]*([^?#]*)", 1)

  /** Per-URL quality signals — the cheap structural gates C4/RefinedWeb
    * apply alongside the domain blocklist (media assets, deep crawl
    * artifacts, parameter-heavy search pages are dropped before any
    * text runs). Pure codegen projection, zero shuffles:
    *   - path_depth: count of non-empty /-separated path segments;
    *   - n_params: &-separated query parameters (0 when no query);
    *   - is_media: path ends in a static-asset extension;
    *   - url_len: total URL length.
    * Returns (doc_id, url, path_depth, n_params, is_media, url_len). */
  def urlQuality(docs: DataFrame, id: Column, url: Column): DataFrame = {
    val path = pathOf(url)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    docs.select(id.as("doc_id"), url.as("url"),
      size(filter(split(path, "/"), s => length(s) > 0))
        .cast("long").as("path_depth"),
      when(query === "", lit(0L))
        .otherwise(size(split(query, "&")).cast("long")).as("n_params"),
      lower(path).rlike("\\.(jpe?g|png|gif|svg|ico|css|js|mp4|webm)$")
        .as("is_media"),
      length(url).cast("long").as("url_len"))
  }

  /** Per-registered-domain rollup — the table a curation run eyeballs
    * (and thresholds) before admitting a crawl slice: URL count,
    * distinct hosts, distinct languages, first doc id. One hash shuffle
    * on the domain; count-distincts expand to the standard two-phase
    * partial aggregation. */
  def domainStats(docs: DataFrame, id: Column, url: Column,
                  lang: Column): DataFrame =
    docs.select(id.as("doc_id"), url.as("url"), lang.as("lang"))
      .select(col("doc_id"), hostOf(col("url")).as("host"), col("lang"))
      .select(col("doc_id"), col("host"),
        registeredDomain(col("host")).as("reg_domain"), col("lang"))
      .groupBy(col("reg_domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("host")).as("n_hosts"),
        countDistinct(col("lang")).as("n_langs"),
        min(col("doc_id")).as("first_doc"))

  /** Domain-blocklist removal: keep docs whose registered domain is NOT
    * on the list. The list rides as a broadcast anti-join side (at
    * 100 TB the blocklist is kilobytes; the fact side never shuffles).
    * Output carries the canonical URL so the downstream pipeline joins
    * on it. */
  def blocklistFilter(docs: DataFrame, id: Column, url: Column,
                      blocklist: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bl = broadcast(blocklist.toDF("blocked_domain"))
    docs.select(id.as("doc_id"), url.as("url"))
      .withColumn("url_canon", canonicalizeUrl(col("url")))
      .withColumn("reg_domain", registeredDomain(hostOf(col("url"))))
      .join(bl, col("reg_domain") === col("blocked_domain"), "left_anti")
  }

  /** Canonicalize-then-dedup: group by canonical URL, keep the lowest
    * id, count the collapse. The standard URL-dedup pass that runs
    * before any content hashing (it removes refetches of the same page
    * under tracking-param/fragment/case variants for free). One hash
    * shuffle on the canonical URL. */
  def urlDedup(docs: DataFrame, id: Column, url: Column): DataFrame =
    docs.select(id.as("doc_id"), canonicalizeUrl(url).as("url_canon"))
      .groupBy(col("url_canon"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).cast("long").as("n_dups"))

  /** Per-domain cap sampling — the Common-Crawl curation discipline
    * that stops one mega-domain from dominating the training mix: keep
    * at most `cap` documents per registered domain, chosen by a
    * DETERMINISTIC content-hash order (salted md5 — reproducible
    * across runs and reshards, the split-assign discipline) with
    * NULLS LAST (a NULL-content doc has no sample key and must never
    * outrank hashed docs — the [[TextAnalysis.stratifiedSample]]
    * rule) and doc id as the tie-break.
    *
    * Shape: one domain-keyed window — partitioned, so the per-domain
    * sort shards; the cap bounds every partition's output. Returns
    * (doc_id, reg_domain, domain_rank) for kept docs only. */
  def domainCap(docs: DataFrame, id: Column, url: Column,
                content: Column, cap: Int, salt: Int = 0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("reg_domain"))
      .orderBy(graft.functions.GraftFunctions.md5Long(col("__t"), salt)
        .asc_nulls_last, col("doc_id"))
    docs.select(id.as("doc_id"), content.as("__t"),
        registeredDomain(hostOf(url)).as("reg_domain"))
      .withColumn("domain_rank", row_number().over(w).cast("long"))
      .filter(col("domain_rank") <= cap)
      .select(col("doc_id"), col("reg_domain"), col("domain_rank"))
  }
}
