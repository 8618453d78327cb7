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

  /** Parse one exposition line; None for comments/blank/malformed. */
  def parseLine(line: String): Option[Sample] = {
    val trimmed = line.trim
    if (trimmed.isEmpty || trimmed.startsWith("#")) return None
    val re = """^([A-Za-z_:][A-Za-z0-9_:]*)(\{([^}]*)\})?\s+([^\s]+)(\s+(-?\d+))?$""".r
    trimmed match {
      case re(name, _, labelStr, valueStr, _, tsStr) =>
        val labels: Map[String, String] =
          if (labelStr == null || labelStr.isEmpty) Map.empty
          else labelStr.split(",").iterator.flatMap { kv =>
            val i = kv.indexOf('=')
            if (i < 0) None
            else Some(kv.substring(0, i).trim ->
              kv.substring(i + 1).trim.stripPrefix("\"").stripSuffix("\""))
          }.toMap
        val v = valueStr match {
          case "+Inf" => Double.PositiveInfinity
          case "-Inf" => Double.NegativeInfinity
          case "NaN" => Double.NaN
          case s => try s.toDouble catch { case _: NumberFormatException => return None }
        }
        Some(Sample(name, labels, v, Option(tsStr).map(_.toLong)))
      case _ => None
    }
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
