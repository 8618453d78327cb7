package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scrape/pushgateway ingestion semantics that sit on top of the text parser
  * (SURVEY.md §2.1):
  *
  *  - pushgateway grouping labels: the request path
  *    `/metrics/job/<job>/<k1>/<v1>/...` decodes into a label map, with the
  *    `@base64` suffix marking URL-safe-base64 values (permissive padding; a
  *    padding-only value is the documented empty-string form, invalid for
  *    `job`) — /root/reference/src/sources/prometheus_pushgateway.rs:98-179
  *  - grouping labels then OVERRIDE the pushed samples' own labels (the
  *    pushgateway grouping contract)
  *  - scrape `instance`/honor_labels: with honor_labels=true the scraped
  *    metric keeps its own `instance` label when present; otherwise the
  *    configured instance is applied. (The reference's literal loop at
  *    prometheus_scrape.rs:129-140 re-inserts the scraped value and then
  *    unconditionally overwrites it, which nets to always-configured; this
  *    implements the documented intent of the `honor_labels` option, noted
  *    here rather than silently mirrored.)
  */
object Scrape {

  /** Decode one pushgateway path label pair (decode_label_pair).
    * Returns None for the error cases the reference 400s on.
    */
  private[sources] def decodeLabelPair(key: String, value: String): Option[(String, String)] =
    key.stripSuffix("@base64") match {
      case k if k == key => Some(key -> value)
      case stripped =>
        if (value.nonEmpty && value.forall(_ == '=')) {
          if (stripped == "job") None // job must not be empty
          else Some(stripped -> "")
        } else {
          val padded = value.length % 4 match {
            case 0 => value
            case m => value + ("=" * m)
          }
          try {
            val decoded = java.util.Base64.getUrlDecoder.decode(padded)
            Some(stripped -> new String(decoded, java.nio.charset.StandardCharsets.UTF_8))
          } catch { case _: IllegalArgumentException => None }
        }
    }

  /** Parse `/metrics/job/...` grouping labels; None for malformed paths
    * (odd segment count, bad base64, empty job) — the 400 analog.
    */
  def parseGroupingPath(path: String): Option[Map[String, String]] = {
    if (path == null || !path.startsWith("/metrics/job")) return None
    val segments = path.split("/").drop(2) // "", "metrics", then pairs
    if (segments.length % 2 != 0) return None
    val pairs = segments.grouped(2).map(p => decodeLabelPair(p(0), p(1))).toSeq
    if (pairs.exists(_.isEmpty)) None
    else {
      val m = pairs.flatten.toMap
      if (m.get("job").contains("")) None else Some(m)
    }
  }

  private val groupingUdf = udf { (path: String) => parseGroupingPath(path).orNull }

  /** Column form: request path → grouping label map (null = 400). */
  def groupingLabels(path: Column): Column = groupingUdf(path)

  /** Pushgateway label merge: grouping labels override the sample's own. */
  def applyGroupingLabels(tags: Column, grouping: Column): Column =
    map_concat(map_filter(tags, (k, _) => !map_contains_key(grouping, k)), grouping)

  /** Scrape instance rule (see object doc for the honor_labels note). */
  def instanceOverride(tags: Column, instance: Column, honorLabels: Boolean): Column =
    if (honorLabels)
      when(map_contains_key(tags, lit("instance")), tags)
        .otherwise(map_concat(tags, map(lit("instance"), instance)))
    else
      map_concat(map_filter(tags, (k, _) => k =!= "instance"),
        map(lit("instance"), instance))
}
