package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Path-driven metricalize: configurable log→metric extraction with a unified
  * tagged MetricValue row, mirroring
  * /root/reference/src/transforms/metricalize.rs:
  *
  *  - each [[MetricSpec]] is one configured metric: a value path, tag paths,
  *    and a kind (counter / gauge / histogram) — `build_series_and_value`
  *    (metricalize.rs:67-102): tags whose path is missing are omitted, a
  *    missing/unparseable value drops the row (a counted failure), a counter
  *    with `increment_by_value = false` counts 1.0 per event
  *  - the output is ONE metric row shape for every kind (the MetricValue
  *    analog, /root/reference/lib/event/src/metric/mod.rs:24-39): (name,
  *    tags, kind, m_sum, m_count, m_buckets)
  *  - kind-mismatch handling (metricalize.rs:233-248): state is keyed by
  *    (name, tags); when a row's kind differs from the state's, the state
  *    RESETS to the new value and a failure is counted. In batch form, with
  *    rows totally ordered by `ord`, that means: the surviving aggregate
  *    covers only the trailing run of rows whose kind equals the final kind,
  *    and `mismatches` counts the kind transitions — exactly the reference's
  *    per-event behavior replayed in event order.
  *
  * Paths: "$.a.b" addresses the JSON column; "col:name" addresses a top-level
  * column (the LogRecord field analog, lib/event/src/log/mod.rs:208-231).
  *
  * Scale shape: per-spec extraction is a codegen'd projection fanout off one
  * cached parent; the only data-sized shuffles hash on (name, tags) — the
  * natural series key — and every window is partitioned by it too, so
  * parallelism tracks series cardinality (high by construction), never spec
  * or kind cardinality.
  */
object Metricalize {

  /** One configured metric (metricalize.rs MetricConfig). */
  final case class MetricSpec(
      name: String,
      kind: String, // "counter" | "gauge" | "histogram"
      valuePath: String,
      tagPaths: Map[String, String] = Map.empty,
      buckets: Seq[Double] = Nil,
      incrementByValue: Boolean = true) {
    require(Set("counter", "gauge", "histogram")(kind), s"unknown kind $kind")
    require(kind != "histogram" || buckets.nonEmpty, "histogram needs buckets")
  }

  private def extract(propsCol: String, path: String): Column =
    if (path.startsWith("col:")) col(path.stripPrefix("col:")).cast("string")
    else get_json_object(col(propsCol), path)

  /** Rows → unified metric rows. `ordCol` is the event's position in the
    * stream-order replay (unique per input row); spec index is folded in so
    * one event's specs apply in config order, like the reference's per-event
    * config loop.
    *
    * Output: (name, tags, kind, m_sum, m_count, m_buckets, mismatches) — one
    * row per (name, tags) series; m_buckets is the cumulative le-ladder for
    * histograms, empty otherwise.
    */
  def metricalize(
      df: DataFrame,
      propsCol: String,
      specs: Seq[MetricSpec],
      ordCol: Column): DataFrame = {
    require(specs.nonEmpty, "at least one MetricSpec")
    val ladder = specs.flatMap(_.buckets).distinct.sorted

    // ONE source scan for all specs: each spec becomes a struct in a per-row
    // array that is exploded — a per-spec union would re-scan the source
    // once per spec (5 specs = 5 parquet scans; at 100 TB the scan IS the
    // cost). Column pruning still reduces the single scan to the referenced
    // columns only.
    val specStructs = specs.zipWithIndex.map { case (sp, i) =>
      val raw = extract(propsCol, sp.valuePath)
      val v =
        if (sp.kind == "counter" && !sp.incrementByValue)
          when(raw.isNotNull, lit(1.0)).otherwise(lit(null).cast("double"))
        else raw.cast("double")
      val tags =
        if (sp.tagPaths.isEmpty) map().cast("map<string,string>")
        else map_filter(
          map(sp.tagPaths.toSeq.sortBy(_._1).flatMap { case (k, p) =>
            Seq(lit(k), extract(propsCol, p))
          }: _*),
          (_, tv) => tv.isNotNull)
      struct(
        lit(sp.name).as("name"),
        tags.as("tags"),
        lit(sp.kind).as("kind"),
        v.as("v"),
        (ordCol.cast("long") * specs.length + i).as("ord"))
    }
    val perSpec = df
      .select(explode(array(specStructs: _*)).as("_m"))
      .select(col("_m.name").as("name"), col("_m.tags").as("tags"),
        col("_m.kind").as("kind"), col("_m.v").as("v"), col("_m.ord").as("ord"))
      .filter(col("v").isNotNull) // missing value = dropped row (counted failure)

    // series key must be orderable (maps aren't groupable); the canonical
    // sorted string is exact because tag values are strings
    val keyed = perSpec.withColumn("skey", TagOps.canonicalTags(col("tags")))

    val series = Window.partitionBy(col("name"), col("skey"))
    val ordered = series.orderBy(col("ord"))
    val staged = keyed
      .withColumn("_last_kind", max_by(col("kind"), col("ord")).over(series))
      .withColumn("_prev_kind", lag(col("kind"), 1).over(ordered))
      .withColumn("_boundary",
        max(when(col("kind") =!= col("_last_kind"), col("ord"))).over(series))
      .withColumn("_mismatch",
        when(col("_prev_kind").isNotNull && col("kind") =!= col("_prev_kind"), 1L)
          .otherwise(0L))

    staged
      .groupBy(col("name"), col("skey"))
      .agg(
        first(col("tags")).as("tags"),
        max_by(col("kind"), col("ord")).as("kind"),
        sum(col("_mismatch")).as("mismatches"),
        // value aggregates over the surviving run only (ord > boundary)
        sum(when(surviving, col("v"))).as("_sum"),
        count(when(surviving, lit(1))).as("m_count"),
        max_by(when(surviving, col("v")), when(surviving, col("ord"))).as("_last"),
        (if (ladder.isEmpty) array().cast("array<bigint>")
         else array(ladder.map(b =>
           sum(when(surviving && col("v") <= b, 1L).otherwise(0L))): _*)).as("_hb"))
      .select(
        col("name"), col("tags"), col("kind"),
        when(col("kind") === "gauge", col("_last")).otherwise(col("_sum")).as("m_sum"),
        col("m_count"),
        when(col("kind") === "histogram", col("_hb"))
          .otherwise(array().cast("array<bigint>")).as("m_buckets"),
        col("mismatches"))
  }

  private def surviving: Column =
    col("_boundary").isNull || col("ord") > col("_boundary")

  /** Streaming metricalize: the reference flushes its state map on a
    * processing-time tick (metricalize.rs:161-190); here the flush is an
    * EVENT-TIME tumbling window + watermark, so emission is deterministic
    * and replayable. One row per (window, name, tags, kind): because each
    * window's state starts empty (the tick analog), a kind conflict within a
    * window yields one row PER KIND rather than the arrival-order reset —
    * the documented divergence (batch [[metricalize]] replays the exact
    * reset semantics when total order exists).
    *
    * `ordCol` breaks ties for gauge last-write-wins; append-mode compatible.
    */
  def metricalizeStream(
      df: DataFrame,
      propsCol: String,
      specs: Seq[MetricSpec],
      tsCol: String,
      bucketSec: Long,
      ordCol: Column,
      watermark: String = "10 minutes"): DataFrame = {
    require(specs.nonEmpty, "at least one MetricSpec")
    val ladder = specs.flatMap(_.buckets).distinct.sorted
    val specStructs = specs.zipWithIndex.map { case (sp, i) =>
      val raw = extract(propsCol, sp.valuePath)
      val v =
        if (sp.kind == "counter" && !sp.incrementByValue)
          when(raw.isNotNull, lit(1.0)).otherwise(lit(null).cast("double"))
        else raw.cast("double")
      val tags =
        if (sp.tagPaths.isEmpty) map().cast("map<string,string>")
        else map_filter(
          map(sp.tagPaths.toSeq.sortBy(_._1).flatMap { case (k, p) =>
            Seq(lit(k), extract(propsCol, p))
          }: _*),
          (_, tv) => tv.isNotNull)
      struct(lit(sp.name).as("name"), tags.as("tags"), lit(sp.kind).as("kind"),
        v.as("v"), (ordCol.cast("long") * specs.length + i).as("ord"))
    }
    df
      .withColumn("_ts", col(tsCol))
      .withWatermark("_ts", watermark)
      .select(col("_ts"), explode(array(specStructs: _*)).as("_m"))
      .select(col("_ts"), col("_m.name").as("name"), col("_m.tags").as("tags"),
        col("_m.kind").as("kind"), col("_m.v").as("v"), col("_m.ord").as("ord"))
      .filter(col("v").isNotNull)
      .withColumn("skey", TagOps.canonicalTags(col("tags")))
      .groupBy(window(col("_ts"), s"$bucketSec seconds").as("w"),
        col("name"), col("skey"), col("kind"))
      .agg(
        first(col("tags")).as("tags"),
        sum(col("v")).as("_sum"),
        count(lit(1)).as("m_count"),
        max_by(col("v"), col("ord")).as("_last"),
        (if (ladder.isEmpty) array().cast("array<bigint>")
         else array(ladder.map(b =>
           sum(when(col("v") <= b, 1L).otherwise(0L))): _*)).as("_hb"))
      .select(
        unix_timestamp(col("w.start")).as("bucket"),
        col("name"), col("tags"), col("kind"),
        when(col("kind") === "gauge", col("_last")).otherwise(col("_sum")).as("m_sum"),
        col("m_count"),
        when(col("kind") === "histogram", col("_hb"))
          .otherwise(array().cast("array<bigint>")).as("m_buckets"))
  }

  /** Per-spec count of rows whose value extraction failed (the
    * `metricalize_failed_total` counter, metricalize.rs:210-215).
    */
  def extractionFailures(df: DataFrame, propsCol: String, specs: Seq[MetricSpec]): DataFrame =
    specs.map { sp =>
      val raw = extract(propsCol, sp.valuePath)
      val v = if (sp.kind == "counter" && !sp.incrementByValue) raw else raw.cast("double")
      df.select(lit(sp.name).as("name"),
        when(v.isNull, 1L).otherwise(0L).as("_f"))
    }.reduce(_ unionByName _)
      .groupBy(col("name")).agg(sum(col("_f")).as("failures"))
}
