package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-keyed dedup for web corpora.
  *
  * Crawled corpora carry the same page under many spellings — scheme
  * variants, `www.` prefixes, mixed-case hosts, tracking query parameters,
  * `index.html` suffixes, fragments, param order — and URL-level dedup is
  * the cheapest, highest-yield dedup pass a crawl pipeline runs (before any
  * content hashing): one narrow canonicalization projection, one shuffle on
  * the canonical key. The reference's dedup surface is content-keyed
  * (DeduplicateTransform, reference README.md operator list); URL keying is
  * the crawl-side complement.
  *
  * Canonical form (applied in this order):
  *   1. drop the scheme (`http://` / `https://`);
  *   2. lowercase the host (authority is case-insensitive; paths are NOT
  *      touched) and drop a leading `www.`;
  *   3. drop the fragment;
  *   4. drop tracking query parameters (`utm_*`, `gclid`, `fbclid`, `ref`)
  *      and SORT the survivors (param order is semantically irrelevant);
  *   5. drop a trailing `/index.html` and a trailing slash.
  *
  * Everything is built from codegen'd string/array built-ins — a narrow
  * scan-speed projection, zero shuffles, streaming-safe. Patterns stay in
  * the Java-regex ∩ RE2 subset (no lookaround/backrefs) so the DuckDB
  * oracle (q159) reproduces the canonicalization byte-for-byte.
  */
object UrlNorm {

  private val TrackingParamPattern = "^(utm_[a-z]+|gclid|fbclid|ref)="

  /** Canonical key for `url` per the rules above. Null-safe: null in →
    * null out (regexp/concat propagate null).
    */
  def canonicalizeUrl(url: Column): Column = {
    val noScheme = regexp_replace(url, "^https?://", "")
    // authority = everything before the first /, ? or #; case-insensitive
    val hostRaw = regexp_extract(noScheme, "^[^/?#]*", 0)
    val rest = regexp_replace(noScheme, "^[^/?#]*", "") // anchored: 1 match
    val host = regexp_replace(lower(hostRaw), "^www\\.", "")
    // path = rest up to ? or #; query = between ? and # (empty if absent)
    val pathRaw = regexp_extract(rest, "^[^?#]*", 0)
    val query = regexp_extract(rest, "\\?([^#]*)", 1)
    val path = regexp_replace(
      regexp_replace(pathRaw, "/index\\.html$", ""), "/$", "")
    val params = array_sort(filter(
      split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamPattern)))
    concat(
      host, path,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

  /** Keep one row per canonical URL — the row with the smallest
    * `tiebreaker` (first-crawled wins under a monotone crawl id). Output =
    * input columns + `canonical_url` + `n_dups` (total rows sharing the
    * canonical key, the kept one included).
    *
    * Shape at scale: the canonicalization is a narrow projection; the
    * keep-first rank and the group count share ONE shuffle on the canonical
    * key (two window functions over the same partitioning collapse into one
    * Window node). Same single-shuffle discipline as [[Dedup.exact]]; a
    * URL duplicated across the whole corpus is one hot window partition —
    * the same bounded hazard [[Dedup.exact]] accepts, and dup groups are
    * count-bounded by crawl frequency, not corpus size.
    */
  def dedupByUrl(df: DataFrame, urlCol: String, tiebreaker: String): DataFrame = {
    val w = Window.partitionBy(col("canonical_url"))
    val wOrd = w.orderBy(col(tiebreaker))
    df.withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
      .withColumn("_rn", row_number().over(wOrd))
      .withColumn("n_dups", count(lit(1)).over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Lowercased authority of `url` (scheme and `www.` stripped) — the
    * grouping key for domain-level crawl analytics. Same regex subset as
    * [[canonicalizeUrl]] (Java ∩ RE2), so oracles replicate byte-for-byte.
    */
  def host(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(regexp_replace(url, "^https?://", ""), "^[^/?#]*", 0)),
      "^www\\.", "")

  /** Registrable-domain HEURISTIC: the last two dot-labels of the host
    * ("a.b.site.com" → "site.com"). Deliberately list-free — a real
    * public-suffix resolution needs the PSL (multi-label TLDs like
    * "co.uk" collapse wrong here); documented as the approximation it is,
    * good enough for per-domain corpus dashboards.
    */
  def apexDomain(url: Column): Column =
    regexp_extract(host(url), "[^.]+\\.[^.]+$", 0)
}
