package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the web-curation pre-hash pass that stops
  * trivially-different spellings of the same page from dodging
  * URL-level dedup (every large crawl pipeline's first dedup key is
  * the canonical URL, before any content hash). Rules are the public
  * RFC 3986 syntax-based normalization plus the standard
  * tracking-parameter strip:
  *
  *  - scheme and host lowercased; default ports dropped (:80 for
  *    http, :443 for https)
  *  - fragment dropped (never reaches the server)
  *  - trailing slashes trimmed from non-root paths; empty path -> "/"
  *  - query parameters: tracking keys removed (utm_*, gclid, fbclid,
  *    ref, mc_cid, mc_eid), empties dropped, the rest SORTED so
  *    param order cannot split a URL's identity; empty query dropped
  *
  * Pure column expressions end-to-end (regexp extracts + higher-order
  * array ops) — codegen-friendly, map-only, and replayable verbatim in
  * the DuckDB oracle. Malformed inputs degrade safely: a string with
  * no scheme://host prefix passes through UNCHANGED — collapsing every
  * malformed string to one canonical key would merge unrelated
  * records, the opposite of a dedup key's job.
  */
object UrlFunctions {

  private val TrackingParam =
    "^(utm_[^=]*|gclid|fbclid|ref|mc_cid|mc_eid)="

  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "http",
        regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val rawPath = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val trimmed = regexp_replace(rawPath, "/+$", "")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    val rawQuery = regexp_extract(url, "\\?([^#]*)", 1)
    val params = array_join(
      array_sort(filter(split(rawQuery, "&"),
        p => p =!= "" && !p.rlike(TrackingParam))), "&")
    when(scheme === "", url) // malformed: pass through, don't collapse
      .otherwise(concat(scheme, lit("://"), host, path,
        when(params === "", lit(""))
          .otherwise(concat(lit("?"), params))))
  }
}
