package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-frontier dedup: the same landing page
  * arrives under dozens of spellings (host case, default ports,
  * fragments, tracking params, param order, trailing slashes) and
  * URL-keyed dedup/frequency/politeness logic needs ONE spelling per
  * resource. Rules applied, in order:
  *
  *   1. drop the fragment (`#...` — client-side only, never sent);
  *   2. lowercase the scheme+authority (case-insensitive per RFC 3986),
  *      leaving the path's case alone (paths ARE case-sensitive);
  *   3. strip default ports (`:443`, `:80`);
  *   4. strip trailing slashes from the path (root collapses to "");
  *   5. drop tracking params (`utm_*`, `fbclid`, `gclid`) and sort the
  *      survivors bytewise, rejoining with `&`.
  *
  * Pure per-row codegen'd string/array chain (regexp + split +
  * array_sort + filter) — zero shuffle at any corpus size, RE2-safe
  * regex subset so the transformation replays on any engine.
  */
object Urls {

  private val TrackingParam = "^(utm_[^=]*|fbclid|gclid)="

  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val head = regexp_extract(noFrag, "^([^?]*)", 1)
    val query = when(noFrag.contains("?"),
      regexp_extract(noFrag, "\\?(.*)$", 1)).otherwise(lit(""))
    val schemeHost = regexp_replace(
      regexp_replace(lower(regexp_extract(head, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)),
        ":443$", ""),
      ":80$", "")
    val path = regexp_replace(
      regexp_replace(head, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""), "/+$", "")
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParam))
    val q2 = array_join(array_sort(params), "&")
    // q2 referenced ONCE: "?"+q2, then a lone "?" (empty survivor set)
    // collapses to "" — a second q2 reference would re-run the
    // interpreted param-filter lambda per row (repeated-lambda audit)
    concat(schemeHost, path,
      regexp_replace(concat(lit("?"), q2), "^\\?$", ""))
  }
}
