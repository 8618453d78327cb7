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
  * source scan (struct-array explode — never a per-spec re-scan). The
  * kind-replay is CHUNKED over the ord space (the AsOfJoin pattern): the only
  * ordered windows partition by (name, tags-key, ord-chunk), so parallelism is
  * series × chunks even when one hot metric family dominates — a window
  * partitioned by the series alone would make one task sort the whole family
  * (the round-2 straggler shape). The price is one extra hash shuffle of the
  * data (chunked window partitioning + the final series groupBy) plus two
  * windows over a tiny series×chunks frame.
  *
  * Histogram buckets are PER SPEC: internally observations are counted
  * against the union ladder of all specs (one codegen'd sum per rung), and
  * each output row exposes only the rungs of the spec that produced its final
  * kind — so two histogram specs with different ladders don't leak each
  * other's uppers. (Divergence note: if two same-name histogram specs with
  * different ladders write the same series, the reference buckets against the
  * ladder of the spec that created the state; here the FINAL spec's ladder is
  * reported. Same-name same-ladder specs — the common case — are exact.)
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

  /** The union bucket ladder the internal per-rung counters use; output rows
    * only expose each spec's own rungs (see class doc).
    */
  def unionLadder(specs: Seq[MetricSpec]): Seq[Double] =
    specs.flatMap(_.buckets).distinct.sorted

  private def extract(propsCol: String, path: String): Column =
    if (path.startsWith("col:")) col(path.stripPrefix("col:")).cast("string")
    else get_json_object(col(propsCol), path)

  /** Per-spec extraction structs off ONE scan: name, tags, kind id, v,
    * packed ord, spec index. Kinds travel as INTEGER ids (index into the
    * static distinct-kind list) so every downstream aggregation buffer is a
    * mutable primitive and the whole replay stays HashAggregate — string
    * min_by/max_by buffers would demote the aggregations to SortAggregate.
    * The packed ord (event ord × #specs + spec position) replays one event's
    * specs in config order; packing is guarded against Long overflow (the
    * tier layer guards its packed ranges the same way, TierRollup.fromObs).
    */
  private def specStructs(propsCol: String, specs: Seq[MetricSpec], ordCol: Column,
      kinds: Seq[String]): Seq[Column] = {
    val maxOrd = Long.MaxValue / specs.length
    val ordL = ordCol.cast("long")
    specs.zipWithIndex.map { case (sp, i) =>
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
      val packed = when(ordL >= 0L && ordL < maxOrd, ordL * specs.length + i)
        .otherwise(raise_error(concat(
          lit(s"metricalize ord out of packed range [0, $maxOrd): "),
          ordL.cast("string"))).cast("long"))
      struct(
        lit(sp.name).as("name"),
        tags.as("tags"),
        lit(kinds.indexOf(sp.kind)).as("kind"),
        v.as("v"),
        packed.as("ord"),
        lit(i).as("sidx"))
    }
  }

  /** Kind id → kind string (static CASE over the distinct-kind list). */
  private def kindStr(kinds: Seq[String], id: Column): Column =
    kinds.zipWithIndex.foldLeft(lit(null).cast("string")) { case (acc, (k, i)) =>
      when(id === i, lit(k)).otherwise(acc)
    }

  /** m_buckets for the FINAL spec (`_fidx`): select that spec's rungs out of
    * the union-ladder counter array `_hb`.
    */
  private def perSpecBuckets(specs: Seq[MetricSpec], ladder: Seq[Double]): Column = {
    val posOf = ladder.zipWithIndex.toMap
    specs.zipWithIndex.foldLeft(array().cast("array<bigint>")) {
      case (acc, (sp, i)) =>
        if (sp.kind != "histogram") acc
        else when(col("_fidx") === i,
          array(sp.buckets.sorted.map(b => col("_hb")(posOf(b))): _*)).otherwise(acc)
    }
  }

  /** Rows → unified metric rows. `ordCol` is the event's position in the
    * stream-order replay (unique per input row, non-negative).
    *
    * Output: (name, tags, kind, m_sum, m_count, m_buckets, mismatches) — one
    * row per (name, tags) series; m_buckets is the final spec's cumulative
    * le-ladder for histograms, empty otherwise.
    *
    * @param numChunks ord-space chunk count — the series × chunks parallelism
    *                  knob for the kind-replay windows
    * @param ordBounds optional caller-supplied [lo, hi] of the RAW `ordCol`
    *                  domain (pre-packing): skips the blocking min/max reduce
    *                  (the AsOfJoin.tsBounds escape) — worth it when the
    *                  caller already knows the ord window, e.g. a
    *                  partition-pruned replay. Rows outside the bounds clamp
    *                  into the first/last chunk (correctness preserved,
    *                  parallelism of the clamped tail degrades).
    */
  def metricalize(
      df: DataFrame,
      propsCol: String,
      specs: Seq[MetricSpec],
      ordCol: Column,
      numChunks: Int = 64,
      ordBounds: Option[(Long, Long)] = None): DataFrame = {
    require(specs.nonEmpty, "at least one MetricSpec")
    require(numChunks >= 1, "numChunks must be >= 1")
    val ladder = unionLadder(specs)
    val kinds = specs.map(_.kind).distinct.sorted

    val perSpec = df
      .select(explode(array(specStructs(propsCol, specs, ordCol, kinds): _*)).as("_m"))
      .select(col("_m.name").as("name"), col("_m.tags").as("tags"),
        col("_m.kind").as("kind"), col("_m.v").as("v"), col("_m.ord").as("ord"),
        col("_m.sidx").as("sidx"))
      .filter(col("v").isNotNull) // missing value = dropped row (counted failure)

    // series key: the SORTED map-entries array (maps aren't groupable;
    // arrays are, both as hash keys and as shuffle keys) — injective with no
    // escaping, and the tags map rebuilds from it at the end, so no map-typed
    // first() aggregate survives to demote the hash aggregation
    val keyed = perSpec
      .withColumn("skey", array_sort(map_entries(col("tags"))))
      .drop("tags")

    // ---- kind-replay, chunked over the ord space ----
    // chunk width from the observed ord span (one tiny map-side reduce),
    // unless the caller supplied the raw-ord bounds — packed bounds follow
    // from the packing (rawLo*n+0 .. rawHi*n+(n-1)); caller bounds may be a
    // subset of the data, so the chunk id clamps into [0, maxChunk]
    val Array(lo, hi) = ordBounds match {
      case Some((l, h)) =>
        require(h >= l, s"ordBounds [$l, $h] inverted")
        Array(l * specs.length, h * specs.length + (specs.length - 1))
      case None =>
        val r = keyed.agg(min(col("ord")), max(col("ord"))).head()
        if (r.isNullAt(0)) Array(0L, 0L) else Array(r.getLong(0), r.getLong(1))
    }
    val chunkW = math.max(1L, (hi - lo) / numChunks + 1)
    val chunked = keyed.withColumn("_chunk",
      greatest(lit(0L), least(lit((hi - lo) / chunkW),
        floor((col("ord") - lo) / chunkW).cast("long"))))

    // (a) within-chunk transitions: the only data-sized ordered window, and it
    // partitions by (series, chunk) — parallelism series × chunks
    val wc = Window.partitionBy(col("name"), col("skey"), col("_chunk")).orderBy(col("ord"))
    val marked = chunked
      .withColumn("_prev_kind", lag(col("kind"), 1).over(wc))
      .withColumn("_mismatch",
        when(col("_prev_kind").isNotNull && col("kind") =!= col("_prev_kind"), 1L)
          .otherwise(0L))

    // (b) per-(series, chunk) summary — hash agg, no sort: first/last kind in
    // ord order plus, for each statically-known kind id k, the max ord among
    // rows whose kind differs from k (the per-chunk boundary candidate)
    val perChunkAggs =
      Seq(min_by(col("kind"), col("ord")).as("_first_kind"),
        max_by(col("kind"), col("ord")).as("_last_kind_c")) ++
        kinds.indices.map(k => max(when(col("kind") =!= k, col("ord"))).as(s"_bnot_$k"))
    val perChunk = chunked
      .groupBy(col("name"), col("skey"), col("_chunk"))
      .agg(perChunkAggs.head, perChunkAggs.tail: _*)

    // (c) per-series reduction over the TINY series×chunks frame: global last
    // kind, cross-chunk transitions (prev non-empty chunk's last kind vs this
    // chunk's first kind), and the global boundary = max ord with
    // kind != last kind (selected from the per-kind candidates)
    val seriesLast = perChunk
      .groupBy(col("name"), col("skey"))
      .agg(max_by(col("_last_kind_c"), col("_chunk")).as("_last_kind"))
    val wSeries = Window.partitionBy(col("name"), col("skey")).orderBy(col("_chunk"))
    val bnotForLast = kinds.indices.foldLeft(lit(null).cast("long")) { (acc, k) =>
      when(col("_last_kind") === k, col(s"_bnot_$k")).otherwise(acc)
    }
    val seriesFrame = perChunk
      .join(seriesLast, Seq("name", "skey"))
      .withColumn("_prev_last", lag(col("_last_kind_c"), 1).over(wSeries))
      .groupBy(col("name"), col("skey"))
      .agg(
        first(col("_last_kind")).as("_last_kind"),
        sum(when(col("_prev_last").isNotNull && col("_prev_last") =!= col("_first_kind"), 1L)
          .otherwise(0L)).as("_cross_mm"),
        max(bnotForLast).as("_boundary"))

    // (d) join the per-series (last kind, boundary, cross-transitions) back
    // and aggregate IN TWO PHASES: per-(series, chunk) partials first —
    // grouped on the SAME keys the replay window already partitioned by, so
    // the broadcast-joined frame needs NO new exchange (EnsureRequirements
    // sees the clustering satisfied) — then the final reduction over the
    // tiny series×chunks frame. A direct groupBy(name, skey) here was the
    // plan's second full-data shuffle; this shape has exactly ONE data-sized
    // exchange end to end. Every buffer stays a mutable primitive →
    // HashAggregate; the tags map rebuilds from the group key itself.
    val survOrd = when(surviving, col("ord"))
    val chunkAggs: Seq[Column] = Seq(
      first(col("_last_kind")).as("_last_kind"),
      first(col("_cross_mm")).as("_cross_mm"),
      sum(col("_mismatch")).as("_mm"),
      max(col("ord")).as("_c_max_ord"),
      max_by(col("sidx"), col("ord")).as("_c_sidx"),
      sum(when(surviving, col("v"))).as("_c_sum"),
      count(when(surviving, lit(1))).as("_c_cnt"),
      // chunks with no survivor leave _c_last_ord null; the final max_by
      // skips null ordering keys, so they can never win
      max_by(when(surviving, col("v")), survOrd).as("_c_last"),
      max(survOrd).as("_c_last_ord")) ++
      ladder.zipWithIndex.map { case (b, i) =>
        sum(when(surviving && col("v") <= b, 1L).otherwise(0L)).as(s"_c_hb_$i")
      }
    val perChunkFinal = marked
      .join(seriesFrame, Seq("name", "skey"))
      .groupBy(col("name"), col("skey"), col("_chunk"))
      .agg(chunkAggs.head, chunkAggs.tail: _*)
    perChunkFinal
      .groupBy(col("name"), col("skey"))
      .agg(
        first(col("_last_kind")).as("_kind"),
        (sum(col("_mm")) + first(col("_cross_mm"))).as("mismatches"),
        max_by(col("_c_sidx"), col("_c_max_ord")).as("_fidx"),
        sum(col("_c_sum")).as("_sum"),
        sum(col("_c_cnt")).as("m_count"),
        max_by(col("_c_last"), col("_c_last_ord")).as("_last"),
        (if (ladder.isEmpty) array().cast("array<bigint>")
         else array(ladder.indices.map(i => sum(col(s"_c_hb_$i"))): _*)).as("_hb"))
      .select(
        col("name"),
        map_from_entries(col("skey")).as("tags"),
        kindStr(kinds, col("_kind")).as("kind"),
        when(col("_kind") === kinds.indexOf("gauge"), col("_last"))
          .otherwise(col("_sum")).as("m_sum"),
        col("m_count"),
        when(col("_kind") === kinds.indexOf("histogram"), perSpecBuckets(specs, ladder))
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
    val ladder = unionLadder(specs)
    val kinds = specs.map(_.kind).distinct.sorted
    df
      .withColumn("_ts", col(tsCol))
      .withWatermark("_ts", watermark)
      .select(col("_ts"), explode(array(specStructs(propsCol, specs, ordCol, kinds): _*)).as("_m"))
      .select(col("_ts"), col("_m.name").as("name"), col("_m.tags").as("tags"),
        col("_m.kind").as("kind"), col("_m.v").as("v"), col("_m.ord").as("ord"),
        col("_m.sidx").as("sidx"))
      .filter(col("v").isNotNull)
      .withColumn("skey", array_sort(map_entries(col("tags"))))
      .groupBy(window(col("_ts"), s"$bucketSec seconds").as("w"),
        col("name"), col("skey"), col("kind"))
      .agg(
        max_by(col("sidx"), col("ord")).as("_fidx"),
        sum(col("v")).as("_sum"),
        count(lit(1)).as("m_count"),
        max_by(col("v"), col("ord")).as("_last"),
        (if (ladder.isEmpty) array().cast("array<bigint>")
         else array(ladder.map(b =>
           sum(when(col("v") <= b, 1L).otherwise(0L))): _*)).as("_hb"))
      .select(
        unix_timestamp(col("w.start")).as("bucket"),
        col("name"),
        map_from_entries(col("skey")).as("tags"),
        kindStr(kinds, col("kind")).as("kind"),
        when(col("kind") === kinds.indexOf("gauge"), col("_last"))
          .otherwise(col("_sum")).as("m_sum"),
        col("m_count"),
        when(col("kind") === kinds.indexOf("histogram"), perSpecBuckets(specs, ladder))
          .otherwise(array().cast("array<bigint>")).as("m_buckets"))
  }

  /** Per-spec count of rows whose value extraction failed (the
    * `metricalize_failed_total` counter, metricalize.rs:210-215). ONE source
    * scan for all specs (struct-array explode), like [[metricalize]] itself —
    * a per-spec union would re-scan the source once per spec.
    */
  def extractionFailures(df: DataFrame, propsCol: String, specs: Seq[MetricSpec]): DataFrame = {
    val structs = specs.map { sp =>
      val raw = extract(propsCol, sp.valuePath)
      val v = if (sp.kind == "counter" && !sp.incrementByValue) raw else raw.cast("double")
      struct(lit(sp.name).as("name"), when(v.isNull, 1L).otherwise(0L).as("f"))
    }
    df.select(explode(array(structs: _*)).as("_m"))
      .groupBy(col("_m.name").as("name"))
      .agg(sum(col("_m.f")).as("failures"))
  }
}
