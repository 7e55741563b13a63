package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization dedup — the web-corpus pass that collapses the
  * many spellings of one resource BEFORE any content hashing: scheme and
  * host case, default ports, fragments, tracking parameters, query-param
  * order, and trailing slashes are all identity-preserving decorations,
  * and at crawl scale they multiply every popular URL into dozens of
  * "distinct" keys (the reference's URI handling is the same concern one
  * level down: it normalizes `flv://host/db/table` before keying —
  * SURVEY.md §2.2 T9).
  *
  * Everything is map-side column work (regexp + higher-order array
  * functions, all codegen'd) followed by ONE hash aggregate on the
  * canonical key — the same shape as exact dedup, so 100 TB of URLs is
  * one shuffle of (canon, id) pairs.
  */
object UrlCanon {

  /** Canonical form:
    *  - scheme, host lowercased; explicit `:443`/`:80` default ports
    *    dropped (scheme-appropriate);
    *  - `#fragment` dropped;
    *  - query params: `utm_*` tracking keys dropped, the rest sorted
    *    byte-wise (param ORDER is not resource identity);
    *  - ALL trailing `/` stripped (so re-canonicalizing is a no-op even
    *    for `/p//`); empty or all-slash path → `/`.
    */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    val host = when(
        scheme === "https" && hostPort.endsWith(":443"),
        regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http" && hostPort.endsWith(":80"),
        regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val path0 = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1)
    // Idempotence requires stripping EVERY trailing slash in one pass:
    // a single-slash strip maps "/p//" -> "/p/" -> "/p" across two passes,
    // splitting dedup groups between a first-pass and a re-ingested corpus.
    val stripped = regexp_replace(path0, "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    val rawQuery = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = filter(
      split(rawQuery, "&"),
      p => p =!= "" && !p.startsWith("utm_"))
    val query = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }
}
