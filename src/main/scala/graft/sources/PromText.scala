package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Prometheus text-format ingestion (SURVEY.md §2.1):
  *  - line parse of `# TYPE` metadata + samples with labels
  *    (reference: /root/reference/lib/prometheus/src/text.rs)
  *  - regrouping flat samples into typed metrics by the `_bucket`/`_sum`/
  *    `_count` name-suffix convention, with `le`/`quantile` labels pulled out
  *    (reference: /root/reference/lib/prometheus/src/pb.rs:44-99 and
  *    src/common/prometheus.rs:183-266)
  *
  * The line parser is a scalar function over a text column (a Dataset of
  * lines scales to any corpus); the histogram regroup is a plain
  * groupBy+collect aggregation — the Spark mapping called out in SURVEY §2.1.
  */
object PromText {

  final case class Sample(name: String, labels: Map[String, String], value: Double,
      ts: Option[Long])

  /** Parse one exposition line; None for comments/blank/malformed.
    *
    * Quote-aware label scan matching the reference grammar
    * (/root/reference/lib/prometheus/src/text.rs): label values are
    * double-quoted strings with `\"`, `\\` and `\n` escapes, and may contain
    * commas and `}` — a naive split on `,` (the round-1 bug) mis-parses them.
    */
  def parseLine(line: String): Option[Sample] = {
    val trimmed = line.trim
    if (trimmed.isEmpty || trimmed.startsWith("#")) return None
    var i = 0
    val n = trimmed.length
    def isNameStart(c: Char) = c.isLetter || c == '_' || c == ':'
    def isNameChar(c: Char) = c.isLetterOrDigit || c == '_' || c == ':'
    if (i >= n || !isNameStart(trimmed(i))) return None
    val nameStart = i
    while (i < n && isNameChar(trimmed(i))) i += 1
    val name = trimmed.substring(nameStart, i)

    var labels = Map.empty[String, String]
    if (i < n && trimmed(i) == '{') {
      i += 1
      var done = false
      while (!done) {
        while (i < n && (trimmed(i) == ' ' || trimmed(i) == ',')) i += 1
        if (i >= n) return None // unterminated label block
        if (trimmed(i) == '}') { i += 1; done = true }
        else {
          if (!isNameStart(trimmed(i))) return None
          val ks = i
          while (i < n && isNameChar(trimmed(i))) i += 1
          val key = trimmed.substring(ks, i)
          while (i < n && trimmed(i) == ' ') i += 1
          if (i >= n || trimmed(i) != '=') return None
          i += 1
          while (i < n && trimmed(i) == ' ') i += 1
          if (i >= n || trimmed(i) != '"') return None
          i += 1
          val sb = new StringBuilder
          var closed = false
          while (!closed) {
            if (i >= n) return None // unterminated string
            trimmed(i) match {
              case '"' => closed = true; i += 1
              case '\\' =>
                if (i + 1 >= n) return None
                trimmed(i + 1) match {
                  case 'n' => sb.append('\n')
                  case '\\' => sb.append('\\')
                  case '"' => sb.append('"')
                  case other => sb.append(other) // lenient: keep unknown escapes
                }
                i += 2
              case c => sb.append(c); i += 1
            }
          }
          labels = labels.updated(key, sb.toString)
        }
      }
    }
    while (i < n && (trimmed(i) == ' ' || trimmed(i) == '\t')) i += 1
    if (i >= n) return None
    val vs = i
    while (i < n && trimmed(i) != ' ' && trimmed(i) != '\t') i += 1
    val valueStr = trimmed.substring(vs, i)
    while (i < n && (trimmed(i) == ' ' || trimmed(i) == '\t')) i += 1
    val tsStr = if (i < n) trimmed.substring(i).trim else ""
    val v = valueStr match {
      case "+Inf" => Double.PositiveInfinity
      case "-Inf" => Double.NegativeInfinity
      case "NaN" => Double.NaN
      case s => try s.toDouble catch { case _: NumberFormatException => return None }
    }
    val ts =
      if (tsStr.isEmpty) None
      else try Some(tsStr.toLong) catch { case _: NumberFormatException => return None }
    Some(Sample(name, labels, v, ts))
  }

  /** Lines dataset → flat samples frame (name, labels, value, ts). */
  def parse(spark: SparkSession, lines: DataFrame): DataFrame = {
    import spark.implicits._
    lines.select(col(lines.columns.head).as("line")).as[String]
      .flatMap(parseLine _)
      .toDF()
  }

  /** Regroup flat histogram samples into one row per series:
    * name_bucket{le=..} + name_sum + name_count → (name, labels-without-le,
    * buckets sorted by le, sum, count). Mirrors pb.rs:44-99.
    */
  def regroupHistograms(samples: DataFrame): DataFrame = {
    val base = samples
      .withColumn("kind",
        when(col("name").endsWith("_bucket"), "bucket")
          .when(col("name").endsWith("_sum"), "sum")
          .when(col("name").endsWith("_count"), "count")
          .otherwise("sample"))
      .filter(col("kind") =!= "sample")
      .withColumn("family", regexp_replace(col("name"), "_(bucket|sum|count)$", ""))
      .withColumn("le", element_at(col("labels"), "le"))
      .withColumn("series_labels", map_filter(col("labels"), (k, _) => k =!= "le"))
    base
      .groupBy(col("family"), col("series_labels"))
      .agg(
        sort_array(collect_list(when(col("kind") === "bucket",
          struct(
            when(col("le") === "+Inf", lit(Double.PositiveInfinity))
              .otherwise(col("le").cast("double")).as("upper"),
            col("value").cast("double").as("cumulative"))))).as("buckets"),
        max(when(col("kind") === "sum", col("value"))).as("h_sum"),
        max(when(col("kind") === "count", col("value"))).cast("long").as("h_count"))
  }
}
