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

  /** Real structural IPv6 validation (function/is_ipv6.rs uses Rust's
    * std parser): at most one `::`, ≤8 groups (exactly 8 when uncompressed),
    * 1–4 hex digits per group, optional trailing dotted-quad IPv4
    * (counts as two groups). A regex alone admits junk like ":::::".
    */
  private val ipv6Udf = udf { (s: String) =>
    if (s == null) null
    else {
      def validGroup(g: String): Boolean =
        g.nonEmpty && g.length <= 4 && g.forall(ch =>
          (ch >= '0' && ch <= '9') || (ch >= 'a' && ch <= 'f') || (ch >= 'A' && ch <= 'F'))
      def validIpv4(g: String): Boolean = {
        val oct = g.split("\\.", -1)
        oct.length == 4 && oct.forall(o =>
          o.nonEmpty && o.length <= 3 && o.forall(_.isDigit) && o.toInt <= 255 &&
            (o.length == 1 || o.head != '0'))
      }
      val compressed = s.indexOf("::")
      val ok =
        if (compressed >= 0 && s.indexOf("::", compressed + 1) >= 0) false // two "::"
        else if (compressed >= 0) {
          val (l, r) = (s.substring(0, compressed), s.substring(compressed + 2))
          val left = if (l.isEmpty) Array.empty[String] else l.split(":", -1)
          val rightRaw = if (r.isEmpty) Array.empty[String] else r.split(":", -1)
          val v4 = rightRaw.nonEmpty && rightRaw.last.contains('.')
          val right = if (v4) rightRaw.dropRight(1) else rightRaw
          val groups = left.length + right.length + (if (v4) 2 else 0)
          groups <= 7 && // "::" stands for at least one zero group
            left.forall(validGroup) && right.forall(validGroup) &&
            (!v4 || validIpv4(rightRaw.last))
        } else {
          val raw = s.split(":", -1)
          val v4 = raw.nonEmpty && raw.last.contains('.')
          val head = if (v4) raw.dropRight(1) else raw
          val groups = head.length + (if (v4) 2 else 0)
          groups == 8 && head.forall(validGroup) && (!v4 || validIpv4(raw.last))
        }
      java.lang.Boolean.valueOf(ok)
    }
  }
  def isIpv6(c: Column): Column = ipv6Udf(c)

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

  /** HashMod relabel op (relabel.rs HashMod,
    * /root/reference/src/transforms/relabel.rs:84-128): the LOW 8 BYTES of
    * md5 — md5[8..16] read as a big-endian unsigned u64 — mod m. Hex chars
    * 17..32 are exactly bytes 8..16; conv(…,16,10) yields the unsigned
    * decimal string, carried through decimal(20,0) (can exceed Long.Max)
    * before the mod. Pure built-ins, codegen'd; parity with the reference
    * is ScalaTest-verified against a JVM MessageDigest oracle.
    */
  def hashMod(c: Column, m: Int): Column =
    pmod(conv(substring(md5(c), 17, 16), 16, 10).cast("decimal(20,0)"),
      lit(m.toLong).cast("decimal(20,0)")).cast("long")

  // ---- parse_query: form-urlencoded → map (function/parse_query.rs) ----

  /** Query string → map<key, array<values>>. The reference returns scalar
    * values that widen to arrays on duplicate keys; a Spark column needs one
    * type, so values are uniformly arrays preserving duplicate order. A
    * leading '?' is tolerated; '+' and %XX decode as form-urlencoded UTF-8;
    * a key without '=' maps to "".
    */
  private val queryUdf = udf { (s: String) =>
    if (s == null) null
    else {
      val q = if (s.startsWith("?")) s.substring(1) else s
      if (q.isEmpty) Map.empty[String, Seq[String]]
      else {
        def dec(x: String): String =
          try java.net.URLDecoder.decode(x, "UTF-8")
          catch { case _: IllegalArgumentException => x }
        q.split("&").iterator.filter(_.nonEmpty).map { kv =>
          val i = kv.indexOf('=')
          if (i < 0) dec(kv) -> "" else dec(kv.substring(0, i)) -> dec(kv.substring(i + 1))
        }.toSeq.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
      }
    }
  }
  def parseQuery(c: Column): Column = queryUdf(c)

  // ---- parse_url: URL components → map (function/parse_url.rs) ----

  /** URL → map with scheme/username/password/host/port/path/query/fragment
    * (the reference's component set, parse_url.rs:102-133); absent optional
    * parts are omitted, invalid URLs → null.
    */
  private val urlUdf = udf { (s: String) =>
    if (s == null) null
    else {
      try {
        val u = new java.net.URI(s)
        if (u.getScheme == null) null
        else {
          val userInfo = Option(u.getUserInfo).getOrElse("")
          val (user, pass) = userInfo.indexOf(':') match {
            case -1 => (userInfo, "")
            case i => (userInfo.substring(0, i), userInfo.substring(i + 1))
          }
          val base = Map(
            "scheme" -> u.getScheme,
            "username" -> user,
            "password" -> pass,
            "path" -> Option(u.getPath).getOrElse(""))
          val opt = Seq(
            Option(u.getHost).map("host" -> _),
            (if (u.getPort >= 0) Some("port" -> u.getPort.toString) else None),
            Option(u.getQuery).map("query" -> _),
            Option(u.getFragment).map("fragment" -> _)).flatten
          base ++ opt
        }
      } catch { case _: java.net.URISyntaxException => null }
    }
  }
  def parseUrl(c: Column): Column = urlUdf(c)

  // ---- parse_regex: named capture groups → map (function/parse_regex.rs) ----

  /** Apply `pattern` and return a map of its NAMED capture groups (group →
    * matched text; non-participating groups omitted); null when the pattern
    * doesn't match. Pattern is compiled once per executor, not per row.
    */
  def parseRegex(c: Column, pattern: String): Column = {
    val names = "\\(\\?<([a-zA-Z][a-zA-Z0-9]*)>".r
      .findAllMatchIn(pattern).map(_.group(1)).toSeq
    // compiled ONCE here on the driver; java.util.regex.Pattern is
    // serializable, so the compiled form ships inside the UDF closure and
    // every task reuses it (compiling per row was a real hot-path cost)
    val compiled = java.util.regex.Pattern.compile(pattern)
    val re = udf { (s: String) =>
      if (s == null) null
      else {
        val m = compiled.matcher(s)
        if (!m.find()) null
        else names.flatMap(n =>
          Option(try m.group(n) catch { case _: IllegalArgumentException => null })
            .map(n -> _)).toMap
      }
    }
    re(c)
  }

  // ---- parse_user_agent (function/parse_user_agent.rs) ----

  /** One ordered classification rule of the woothee-subset ruleset: a
    * substring trigger, the family name, the token whose "token/1.2.3" (or
    * "token 1.2.3") suffix carries the version, and the device category.
    */
  private final case class UaRule(trigger: String, family: String,
      versionToken: String, category: String)

  /** Table-driven subset of the public woothee ruleset (the dataset the
    * reference's parse_user_agent delegates to via the woothee crate,
    * parse_user_agent.rs:55-66). Rule ORDER is the woothee classification
    * order: crawlers first, then vendor browsers before the Chrome/Safari
    * fallthrough (every Chromium vendor ships "Chrome/… Safari/…" in its UA),
    * then HTTP tools. Category vocabulary: pc / smartphone / crawler / misc.
    */
  private val uaBrowserRules: Seq[UaRule] = Seq(
    // crawlers (woothee dataset/crawler.yaml subset)
    UaRule("Googlebot", "Googlebot", "Googlebot", "crawler"),
    UaRule("bingbot", "bingbot", "bingbot", "crawler"),
    UaRule("Baiduspider", "Baiduspider", "Baiduspider", "crawler"),
    UaRule("YandexBot", "YandexBot", "YandexBot", "crawler"),
    UaRule("Yahoo! Slurp", "Yahoo! Slurp", "Slurp", "crawler"),
    // vendor Chromium browsers before Chrome
    UaRule("Edg/", "Edge", "Edg", "pc"),
    UaRule("Edge/", "Edge", "Edge", "pc"),
    UaRule("OPR/", "Opera", "OPR", "pc"),
    UaRule("Vivaldi/", "Vivaldi", "Vivaldi", "pc"),
    UaRule("YaBrowser/", "Yandex Browser", "YaBrowser", "pc"),
    UaRule("SamsungBrowser/", "Samsung Internet", "SamsungBrowser", "pc"),
    UaRule("UCBrowser/", "UC Browser", "UCBrowser", "pc"),
    // Gecko / iOS shells
    UaRule("FxiOS/", "Firefox", "FxiOS", "pc"),
    UaRule("Firefox/", "Firefox", "Firefox", "pc"),
    UaRule("CriOS/", "Chrome", "CriOS", "pc"),
    UaRule("Chromium/", "Chromium", "Chromium", "pc"),
    UaRule("Chrome/", "Chrome", "Chrome", "pc"),
    // Presto-era Opera carries "Version/x" too — classify before Safari
    UaRule("Opera/", "Opera", "Version", "pc"),
    // Safari only after every Chromium vendor (they all carry "Safari/")
    UaRule("Version/", "Safari", "Version", "pc"),
    UaRule("MSIE ", "Internet Explorer", "MSIE", "pc"),
    UaRule("Trident/", "Internet Explorer", "rv", "pc"),
    // HTTP tools (woothee "misc" category)
    UaRule("curl/", "curl", "curl", "misc"),
    UaRule("Wget/", "wget", "Wget", "misc"),
    UaRule("python-requests/", "python-requests", "python-requests", "misc"),
    UaRule("Go-http-client/", "Go-http-client", "Go-http-client", "misc"),
    UaRule("okhttp/", "okhttp", "okhttp", "misc"))

  /** Windows NT marketing names (woothee dataset/os.yaml subset). */
  private val uaWindowsVersions: Seq[(String, String)] = Seq(
    "Windows NT 10.0" -> "Windows 10",
    "Windows NT 6.3" -> "Windows 8.1",
    "Windows NT 6.2" -> "Windows 8",
    "Windows NT 6.1" -> "Windows 7",
    "Windows NT 6.0" -> "Windows Vista",
    "Windows NT 5.1" -> "Windows XP")

  /** User-agent → map(browser.family, browser.version, os.family, os.version,
    * device.category) — the reference's woothee field set
    * (parse_user_agent.rs:58-66). Classification walks [[uaBrowserRules]] in
    * order; OS detection then refines the category (Android/iOS → smartphone,
    * crawlers stay crawlers). Unknown agents classify as
    * ("unknown", "", "unknown", "", "unknown") like woothee's maybe_none.
    */
  private val uaUdf = udf { (s: String) =>
    if (s == null) null
    else {
      val ua = s
      def ver(token: String): String = {
        val m = java.util.regex.Pattern.compile(
          java.util.regex.Pattern.quote(token) + "[/: ]([0-9][0-9._]*)").matcher(ua)
        if (m.find()) m.group(1) else ""
      }
      val rule = uaBrowserRules.find(r => ua.contains(r.trigger))
      val (bf, bv, cat0) = rule match {
        case Some(r) =>
          val v = if (r.trigger == "Trident/") {
            val rv = ver("rv"); if (rv.isEmpty) "11.0" else rv
          } else ver(r.versionToken)
          (r.family, v, r.category)
        case None => ("unknown", "", "unknown")
      }
      val isCrawler = cat0 == "crawler" ||
        ua.toLowerCase.contains("crawler") || ua.toLowerCase.contains("spider") ||
        ua.toLowerCase.contains("bot/") || ua.toLowerCase.endsWith("bot")
      val (osf, osv) =
        if (ua.contains("Windows"))
          uaWindowsVersions.find(w => ua.contains(w._1))
            .map(w => (w._2, w._1.stripPrefix("Windows ")))
            .getOrElse(("Windows UNKNOWN Ver", ""))
        else if (ua.contains("Android")) ("Android", ver("Android"))
        else if (ua.contains("iPhone OS")) ("iOS", ver("iPhone OS").replace('_', '.'))
        else if (ua.contains("iPad")) ("iOS", ver("CPU OS").replace('_', '.'))
        else if (ua.contains("Mac OS X"))
          ("Mac OSX", ver("Mac OS X").replace('_', '.'))
        else if (ua.contains("CrOS")) ("ChromeOS", "")
        else if (ua.contains("Linux")) ("Linux", "")
        else ("unknown", "")
      val category =
        if (isCrawler) "crawler"
        else if (osf == "Android" || osf == "iOS") "smartphone"
        else if (cat0 == "misc") "misc"
        else if (bf == "unknown" && osf == "unknown") "unknown"
        else "pc"
      Map("browser.family" -> bf, "browser.version" -> bv,
        "os.family" -> (if (isCrawler && osf == "unknown") "unknown" else osf),
        "os.version" -> osv,
        "device.category" -> category)
    }
  }
  def parseUserAgent(c: Column): Column = uaUdf(c)
}
