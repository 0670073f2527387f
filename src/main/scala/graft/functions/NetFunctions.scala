package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Url / IpAddr domain scalars — the reference's validated `Url` and
  * `IpAddr` value types (/root/reference/amadeus-types/src/http.rs,
  * value.rs:142-146) as column functions. Parsing is native
  * (`parse_url`/regexp, codegen'd); values that fail validation become
  * null, mirroring the reference's fallible downcasts.
  */
object NetFunctions {

  def urlHost(c: Column): Column = try_parse_url(c, lit("HOST"))
  def urlPath(c: Column): Column = try_parse_url(c, lit("PATH"))
  def urlProtocol(c: Column): Column = try_parse_url(c, lit("PROTOCOL"))
  def urlQueryParam(c: Column, key: String): Column =
    try_parse_url(c, lit("QUERY"), lit(key))

  /** loose URL validity: parses with a protocol and a host */
  def isValidUrl(c: Column): Column =
    urlProtocol(c).isNotNull && urlHost(c).isNotNull

  private val Ipv4Pattern =
    "^((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\.){3}(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)$"

  def isIpv4(c: Column): Column = c.rlike(Ipv4Pattern)

  /** colon-delimited hex groups with optional `::` elision */
  def isIpv6(c: Column): Column =
    c.rlike("^([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}$") ||
      (c.contains("::") && c.rlike("^[0-9A-Fa-f:]{2,39}$"))

  def isIpAddr(c: Column): Column = isIpv4(c) || isIpv6(c)

  /** IPv4 dotted quad → uint32 as long (for range joins vs CIDR tables) */
  def ipv4ToLong(c: Column): Column = {
    val p = split(c, "\\.")
    when(isIpv4(c),
      p.getItem(0).cast("long") * 16777216L + p.getItem(1).cast("long") * 65536L +
        p.getItem(2).cast("long") * 256L + p.getItem(3).cast("long"))
  }

  private val UrlParts = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?"

  /** Canonical URL form for URL-level deduplication (the RefinedWeb /
    * CommonCrawl "one document per URL" step — Penedo et al. 2023 §3.1
    * dedups on normalized URLs before anything touches the text):
    * lowercase scheme and host, strip a leading `www.`, drop the default
    * port (`:443` https / `:80` http), drop the fragment, strip a
    * trailing slash from the path, drop `utm_*` tracking parameters and
    * SORT the surviving query parameters (param order never
    * distinguishes documents). Pure regexp/array functions — narrow,
    * codegen'd, no UDF — and deliberately RE2-safe (no lookarounds) so
    * an external engine can replay it (gate d19).
    *
    * Malformed input (no `scheme://host`) canonicalizes to null. */
  def canonicalizeUrl(c: Column): Column = {
    val scheme = lower(regexp_extract(c, UrlParts, 1))
    val rawHost = lower(regexp_extract(c, UrlParts, 2))
    val noWww = regexp_replace(rawHost, "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .otherwise(noWww)
    val path = regexp_replace(regexp_extract(c, UrlParts, 3), "/$", "")
    val params = filter(
      split(regexp_replace(regexp_extract(c, UrlParts, 4), "^\\?", ""), "&"),
      p => p =!= "" && !p.startsWith("utm_"))
    val q = array_join(array_sort(params), "&")
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path,
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** Host of the canonical form (post `www.`/port normalization) — the
    * key for host-level blocklists and per-domain caps. */
  def canonicalHost(c: Column): Column = {
    val h = canonicalizeUrl(c)
    when(h.isNull, lit(null).cast("string"))
      .otherwise(regexp_extract(h, UrlParts, 2))
  }
}
