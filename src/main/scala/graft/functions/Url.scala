package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the step that PRODUCES
  * the host-level (src, dst, w) edges the graph family
  * ([[graft.analyze.GraphOps]]) ranks: crawl URLs arrive with mixed-case
  * schemes/hosts, `www.` prefixes, default ports, trailing slashes,
  * fragments, and query params in arbitrary order, and every one of
  * those variants must collapse to ONE canonical form before host
  * extraction, link-graph aggregation, or URL-level dedup can work.
  *
  * Everything here is a composition of codegen'd built-ins
  * (regexp_extract / regexp_replace / split / array_sort / array_join)
  * — narrow, per-row, no shuffle, linear at any scale — and every
  * regex is anchored-or-suffix so it matches at most once, keeping the
  * DuckDB replay (first-match replace) byte-identical without `'g'`
  * flags. Patterns use only character classes and anchors (portable
  * across Java regex and RE2).
  *
  * Canonical form: `scheme://host[:port][path][?sortedquery]` where
  *  - scheme and host are lowercased,
  *  - a leading `www.` on the host is stripped,
  *  - the port is dropped when it is the scheme default (http:80,
  *    https:443),
  *  - the fragment (`#...`) is dropped,
  *  - trailing `/` runs on the path are stripped (so `/a/` ≡ `/a`, and
  *    a bare `/` path ≡ no path),
  *  - query params are `&`-split, empties dropped, sorted
  *    lexicographically, and rejoined.
  * Non-URL strings (no `scheme://`) normalize to host-only handling of
  * the raw string: lowercased, `www.`-stripped — so bare hostnames
  * round-trip sensibly through [[urlHost]].
  */
object UrlFunctions {

  private val SchemePat = "^([A-Za-z][A-Za-z0-9+.\\-]*)://"

  /** Canonical URL (see object scaladoc for the exact normal form). */
  def urlNormalize(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "") // fragment off first
    val scheme = lower(regexp_extract(u, SchemePat, 1))
    val rest = regexp_replace(u, SchemePat, "")
    val authority = regexp_extract(rest, "^([^/?]*)", 1)
    val host = regexp_replace(
      regexp_replace(lower(regexp_extract(authority, "^([^:]*)", 1)),
        "^www\\.", ""),
      "\\.$", "") // trailing root-dot (example.com. ≡ example.com)
    val port = regexp_extract(authority, ":([0-9]+)$", 1)
    val portNorm = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val pathQuery = regexp_replace(rest, "^[^/?]*", "")
    val path = regexp_replace(regexp_extract(pathQuery, "^([^?]*)", 1),
      "/+$", "")
    val query = regexp_extract(pathQuery, "\\?(.*)$", 1)
    val qSorted = array_join(
      array_sort(filter(split(query, "&"), p => length(p) > 0)), "&")
    val queryNorm = when(length(qSorted) > 0, concat(lit("?"), qSorted))
      .otherwise(lit(""))
    when(url.isNull, lit(null).cast("string"))
      .when(scheme === "", host) // bare hostname / non-URL: host rules only
      .otherwise(concat(scheme, lit("://"), host, portNorm, path, queryNorm))
  }

  /** The canonical HOST of a URL (lowercased, `www.`-stripped, port and
    * everything after the authority dropped) — the node identity of the
    * host-level link graph. Accepts raw (un-normalized) URLs. */
  def urlHost(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "")
    val rest = regexp_replace(u, SchemePat, "")
    val authority = regexp_extract(rest, "^([^/?]*)", 1)
    when(url.isNull, lit(null).cast("string"))
      .otherwise(regexp_replace(
        regexp_replace(lower(regexp_extract(authority, "^([^:]*)", 1)),
          "^www\\.", ""),
        "\\.$", ""))
  }
}
