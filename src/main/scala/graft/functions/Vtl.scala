package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** VTL stdlib surface (SURVEY.md §2.7): vertex's expression language has a
  * 74-function stdlib (/root/reference/lib/vtl/src/compiler/function/, one
  * file per function). Nearly all map to built-in Catalyst functions (see the
  * §2.7 table); this object implements the remainder that have no single
  * built-in — as Column compositions wherever possible (codegen'd), UDFs only
  * for the few that need real parsing.
  */
object Vtl {

  // ---- case styles (reference: function/{camelcase,kebabcase,pascalcase,snakecase}.rs) ----

  /** Split an identifier into lowercase words (handles spaces, -, _, camel humps). */
  private def words(c: Column): Column =
    split(lower(regexp_replace(c, "([a-z0-9])([A-Z])", "$1 $2")), "[ _\\-]+")

  def snakecase(c: Column): Column = array_join(words(c), "_")
  def kebabcase(c: Column): Column = array_join(words(c), "-")
  def pascalcase(c: Column): Column =
    array_join(transform(words(c), w => initcap(w)), "")
  def camelcase(c: Column): Column = {
    val ws = words(c)
    concat(element_at(ws, 1),
      array_join(transform(slice(ws, 2, 1000000), w => initcap(w)), ""))
  }

  // ---- string utilities ----

  /** truncate with ellipsis flag (function/truncate.rs). */
  def truncateStr(c: Column, n: Int, ellipsis: Boolean = false): Column =
    if (ellipsis) when(length(c) > n, concat(substring(c, 1, n), lit("..."))).otherwise(c)
    else substring(c, 1, n)

  /** redact: replace regex matches with a fixed marker (function/redact.rs). */
  def redact(c: Column, pattern: String): Column =
    regexp_replace(c, pattern, "[REDACTED]")

  // ---- parse_bytes: "10MiB" → bytes (function/parse_bytes.rs) ----
  private val bytesUdf = udf { (s: String) =>
    if (s == null) null
    else {
      val m = "(?i)^\\s*([0-9]+(?:\\.[0-9]+)?)\\s*([KMGTPE]?i?B?)\\s*$".r
      s match {
        case m(num, unit) =>
          val mult = unit.toUpperCase.stripSuffix("B") match {
            case "" => 1L
            case "K" => 1000L case "KI" => 1L << 10
            case "M" => 1000000L case "MI" => 1L << 20
            case "G" => 1000000000L case "GI" => 1L << 30
            case "T" => 1000000000000L case "TI" => 1L << 40
            case "P" => 1000000000000000L case "PI" => 1L << 50
            case "E" => 1000000000000000000L case "EI" => 1L << 60
            case _ => -1L
          }
          if (mult < 0) null else java.lang.Long.valueOf((num.toDouble * mult).toLong)
        case _ => null
      }
    }
  }
  def parseBytes(c: Column): Column = bytesUdf(c)

  // ---- parse_duration: "1h30m15s" → seconds (function/parse_duration.rs) ----
  private val durationUdf = udf { (s: String) =>
    if (s == null) null
    else {
      val m = "([0-9]+(?:\\.[0-9]+)?)(ns|us|µs|ms|s|m|h|d|w)".r
      val parts = m.findAllMatchIn(s).toSeq
      if (parts.isEmpty) null
      else {
        val secs = parts.map { g =>
          val v = g.group(1).toDouble
          g.group(2) match {
            case "ns" => v / 1e9
            case "us" | "µs" => v / 1e6
            case "ms" => v / 1e3
            case "s" => v
            case "m" => v * 60
            case "h" => v * 3600
            case "d" => v * 86400
            case "w" => v * 604800
          }
        }.sum
        java.lang.Double.valueOf(secs)
      }
    }
  }
  def parseDurationSecs(c: Column): Column = durationUdf(c)

  // ---- IP / CIDR (function/{cidr_contains,is_ipv4,is_ipv6}.rs) ----

  def isIpv4(c: Column): Column =
    c.rlike("^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$")

  def isIpv6(c: Column): Column =
    c.rlike("^([0-9a-fA-F]{0,4}:){2,7}[0-9a-fA-F]{0,4}$")

  private val cidrUdf = udf { (cidr: String, ip: String) =>
    try {
      val Array(net, bitsStr) = cidr.split("/")
      val bits = bitsStr.toInt
      def toLong(a: String): Long = {
        val octets = a.split("\\.")
        require(octets.length == 4 && octets.forall(o => o.toInt >= 0 && o.toInt <= 255))
        octets.map(_.toLong).foldLeft(0L)((acc, o) => (acc << 8) | o)
      }
      if (bits < 0 || bits > 32) null
      else {
        val mask = if (bits == 0) 0L else (-1L << (32 - bits)) & 0xFFFFFFFFL
        java.lang.Boolean.valueOf((toLong(ip) & mask) == (toLong(net) & mask))
      }
    } catch { case _: Exception => null }
  }
  def cidrContains(cidr: Column, ip: Column): Column = cidrUdf(cidr, ip)

  /** HashMod relabel op (md5 % m — relabel.rs HashMod,
    * /root/reference/src/transforms/relabel.rs:15-52): low 8 hex digits of
    * md5, mod m — pure built-ins.
    */
  def hashMod(c: Column, m: Int): Column =
    pmod(conv(substring(md5(c), 25, 8), 16, 10).cast("long"), lit(m.toLong))
}
