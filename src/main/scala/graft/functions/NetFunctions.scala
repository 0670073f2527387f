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
}
