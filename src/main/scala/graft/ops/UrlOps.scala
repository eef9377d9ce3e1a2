package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and per-domain quotas — the first dedup key of
  * a crawl pipeline (CCNet/Gopher practice: canonicalize the URL,
  * dedup on it, then cap each registered domain's share of the corpus
  * so no single site dominates training data). No counterpart in the
  * feldman reference — LLM-pipeline mandate.
  *
  * Everything here is pure per-row codegen'd expressions (regex +
  * array ops), so the whole layer is shuffle-free and pushes past
  * scans; the DuckDB oracles replay the identical rules, making the
  * normalization value-checked cross-engine.
  */
object UrlOps {

  /** Frozen subset of multi-part public suffixes. A production system
    * swaps in the full public-suffix list; the LOGIC (last-2 labels,
    * or last-3 when the last-2 form a listed multi-part suffix) is
    * what the engine provides and the oracle replays.
    */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "org.uk", "gov.uk", "co.jp", "co.in", "co.nz",
    "com.au", "net.au", "com.br", "com.cn", "com.mx")

  private val TrackingParamRe = "^(utm_[^=]*|gclid|fbclid|ref)(=|$)"

  /** Canonical URL form. Deterministic rules, applied in order:
    *  1. fragment dropped;
    *  2. scheme and host:port lowercased (path/query case preserved);
    *  3. default port stripped (http :80, https :443 — only those
    *     schemes; other schemes keep their port);
    *  4. tracking query params dropped (utm_*, gclid, fbclid, ref),
    *     remaining params kept IN ORDER (reordering would merge
    *     semantically different URLs on sites with positional params);
    *     an emptied query loses its '?';
    *  5. trailing '/'s dropped from the path (root included:
    *     `https://x.com/` → `https://x.com`).
    *
    * Non-URL strings (no `scheme://`) pass through unchanged — a
    * crawl frame's junk rows stay greppable instead of half-mangled.
    */
  def urlNormalize(url: Column): Column = {
    val pre = regexp_extract(url, "^([^#]*)", 1) // fragment dropped
    val scheme = lower(regexp_extract(pre, "^([^:/?#]+)://", 1))
    val hostport = lower(regexp_extract(pre, "^[^:/?#]+://([^/?#]*)", 1))
    val path = regexp_extract(pre, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(pre, "\\?(.*)$", 1)
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val keptParams = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))
    val cleanQuery = array_join(keptParams, "&")
    val cleanPath = regexp_replace(path, "/+$", "")
    when(scheme === "", url).otherwise(concat(
      scheme, lit("://"), host, cleanPath,
      when(cleanQuery === "", lit("")).otherwise(concat(lit("?"), cleanQuery))))
  }

  /** Host of a URL, lowercased, port dropped (any port — the host
    * identity doesn't depend on it).
    */
  def urlHost(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^[^:/?#]+://([^/?#]*)", 1)),
      ":[0-9]+$", "")

  /** Registered (pay-level) domain of a host: the last two labels,
    * or three when the last two are a listed multi-part suffix
    * (`a.b.example.co.uk` → `example.co.uk`). Hosts with fewer labels
    * (bare names, localhost) pass through unchanged.
    */
  def registeredDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".", element_at(parts, -3), element_at(parts, -2),
      element_at(parts, -1))
    when(n <= 2, host)
      .when(last2.isin(MultiPartSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** Per-domain quota: at most `n` rows per registered domain, chosen
    * by the deterministic hash coordinate (same coordinate machinery
    * as SampleOps — reruns, engines, and partitionings agree on the
    * survivors; growing a domain only displaces the highest-coordinate
    * rows). One shuffle (the per-domain window). At 100 TB pre-filter
    * with [[SampleOps.deterministicSample]] at a fraction safely above
    * n/domain-size so the window sees a bounded slice, and note the
    * corpus rows carry only the added domain column — no text
    * duplication.
    */
  def capPerDomain(df: DataFrame, keyCol: String, urlCol: String, n: Int,
      salt: String): DataFrame =
    SampleOps.stratifiedTake(
      df.withColumn("domain", registeredDomain(urlHost(col(urlCol)))),
      keyCol, "domain", n, salt)
}
