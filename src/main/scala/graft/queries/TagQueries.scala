package graft.queries

import graft.functions.TagOps
import graft.functions.TagOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tag-map metric-model queries: the reference's metric identity is
  * {name, tags} (/root/reference/lib/event/src/metric/mod.rs:67-71) and the
  * relabel transform is an ordered op list over the tags map
  * (/root/reference/src/transforms/relabel.rs:15-134). These queries exercise
  * the MapType tag model end-to-end with DuckDB oracles (maps are compared
  * via their canonical sorted "k=v" string).
  */
object TagQueries {

  /** q38: all 9 relabel ops chained over a real tags map built from events,
    * grouped by the resulting canonical series identity. Whole chain is one
    * codegen'd projection; the only shuffle is the final groupBy.
    */
  def relabelTags(s: SparkSession, dir: String): DataFrame = {
    val e = EventQueries.events(s, dir)
    val tagged = e.withColumn("tags", map(
      lit("type"), col("event_type"),
      lit("user"), col("user_id").cast("string"),
      lit("tmp"), lit("x"),
      lit("env"), lit("PROD")))
    val ops = Seq(
      LowercaseTag("env"), // PROD -> prod
      RenameTag("type", "kind"), // type=<event_type> -> kind=<event_type>
      HashModTag("user", Some("shard"), 7), // shard = md5(user)[8..16] % 7
      DeleteTag("tmp"),
      AddTag("region", lit("eu")), // absent -> added
      AddTag("env", lit("ignored")), // present -> no-op
      SetTag("app", lit("graft")),
      DropTags("^u.*"), // drops "user"
      KeepTags("^(kind|shard|env|region|app)$"))
    tagged
      // fused single-pass chain: the applyOps Catalyst composition stacks 9
      // interpreted map HOFs — measured 6.95 s of q38's 7.56 s at sf0.1;
      // the fused form is semantics-identical (TagOpsSpec runs both)
      .withColumn("rt", TagOps.applyOpsFused(col("tags"), ops))
      .groupBy(TagOps.canonicalTags(col("rt")).as("series"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("series"))
  }

  /** q38 oracle: the same op chain expressed as a DuckDB string build —
    * sorted key order app,env,kind,region,shard; hashMod via md5 hex 17..32
    * as unsigned 64-bit.
    */
  val relabelTagsOracle: String =
    """SELECT 'app=graft,env=prod,kind=' || event_type || ',region=eu,shard=' ||
      |  (('0x' || substring(md5(user_id::VARCHAR), 17, 16))::UBIGINT % 7)::VARCHAR AS series,
      |  count(*) AS cnt
      |FROM events GROUP BY 1 ORDER BY series""".stripMargin

  /** q39: path-driven metricalize over the events props JSON with all three
    * kinds plus a deliberately conflicting series — "k_conflict" is written
    * as a counter AND a gauge by consecutive specs, so every event flips the
    * kind: the reference resets state and counts a failure on each flip
    * (metricalize.rs:233-248); here the surviving aggregate is the trailing
    * same-kind run and `mismatches` counts the flips.
    */
  def metricalizePaths(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Metricalize._
    val e = EventQueries.events(s, dir)
    val specs = Seq(
      MetricSpec("k_total", "counter", "$.k",
        tagPaths = Map("type" -> "col:event_type")),
      MetricSpec("k_conflict", "counter", "$.k",
        tagPaths = Map("type" -> "col:event_type")),
      MetricSpec("k_conflict", "gauge", "$.k",
        tagPaths = Map("type" -> "col:event_type")),
      MetricSpec("k_hist", "histogram", "$.k",
        tagPaths = Map("type" -> "col:event_type"), buckets = Seq(25.0, 50.0, 75.0, 100.0)),
      MetricSpec("k_events", "counter", "$.k", incrementByValue = false,
        tagPaths = Map("type" -> "col:event_type")))
    // no ordBounds here: a loose superset would collapse the ord chunks (the
    // event_id domain is SF-dependent) — the one tiny stats reduce is the
    // right trade; callers that KNOW their ord window (the bench, partition
    // replays) pass ordBounds
    metricalize(e, "props", specs, col("event_id"))
      .select(col("name"), graft.functions.TagOps.canonicalTags(col("tags")).as("series"),
        col("kind"), round(col("m_sum"), 4).as("m_sum"), col("m_count"),
        concat_ws(",", col("m_buckets")).as("m_buckets"), col("mismatches"))
      .orderBy(col("name"), col("series"))
  }

  /** q39 oracle: replay the same spec fanout + kind-reset semantics with
    * DuckDB window functions over json_extract'd values.
    */
  val metricalizePathsOracle: String =
    """WITH ev AS (SELECT event_type, event_id,
      |              json_extract(props, '$.k')::DOUBLE AS v FROM events),
      |rows AS (
      |  SELECT 'k_total' AS name, event_type, 'counter' AS kind, v,
      |         event_id * 5 + 0 AS ord FROM ev WHERE v IS NOT NULL
      |  UNION ALL
      |  SELECT 'k_conflict', event_type, 'counter', v, event_id * 5 + 1 FROM ev
      |  WHERE v IS NOT NULL
      |  UNION ALL
      |  SELECT 'k_conflict', event_type, 'gauge', v, event_id * 5 + 2 FROM ev
      |  WHERE v IS NOT NULL
      |  UNION ALL
      |  SELECT 'k_hist', event_type, 'histogram', v, event_id * 5 + 3 FROM ev
      |  WHERE v IS NOT NULL
      |  UNION ALL
      |  SELECT 'k_events', event_type, 'counter', 1.0, event_id * 5 + 4 FROM ev
      |  WHERE v IS NOT NULL),
      |st AS (
      |  SELECT *,
      |    arg_max(kind, ord) OVER w AS last_kind,
      |    lag(kind) OVER (PARTITION BY name, event_type ORDER BY ord) AS prev_kind
      |  FROM rows WINDOW w AS (PARTITION BY name, event_type)),
      |st2 AS (
      |  SELECT *,
      |    max(CASE WHEN kind != last_kind THEN ord END) OVER
      |      (PARTITION BY name, event_type) AS boundary
      |  FROM st),
      |agg AS (
      |  SELECT name, 'type=' || event_type AS series,
      |    arg_max(kind, ord) AS kind,
      |    sum(CASE WHEN prev_kind IS NOT NULL AND kind != prev_kind
      |        THEN 1 ELSE 0 END)::BIGINT AS mismatches,
      |    sum(CASE WHEN boundary IS NULL OR ord > boundary THEN v END) AS s_sum,
      |    count(CASE WHEN boundary IS NULL OR ord > boundary THEN 1 END) AS m_count,
      |    arg_max(CASE WHEN boundary IS NULL OR ord > boundary THEN v END,
      |            CASE WHEN boundary IS NULL OR ord > boundary THEN ord END) AS s_last,
      |    sum(CASE WHEN (boundary IS NULL OR ord > boundary) AND v <= 25 THEN 1 ELSE 0 END)::BIGINT AS b1,
      |    sum(CASE WHEN (boundary IS NULL OR ord > boundary) AND v <= 50 THEN 1 ELSE 0 END)::BIGINT AS b2,
      |    sum(CASE WHEN (boundary IS NULL OR ord > boundary) AND v <= 75 THEN 1 ELSE 0 END)::BIGINT AS b3,
      |    sum(CASE WHEN (boundary IS NULL OR ord > boundary) AND v <= 100 THEN 1 ELSE 0 END)::BIGINT AS b4
      |  FROM st2 GROUP BY 1, 2)
      |SELECT name, series, kind,
      |  round(CASE WHEN kind = 'gauge' THEN s_last ELSE s_sum END, 4) AS m_sum,
      |  m_count,
      |  CASE WHEN kind = 'histogram'
      |       THEN b1::VARCHAR || ',' || b2 || ',' || b3 || ',' || b4
      |       ELSE '' END AS m_buckets,
      |  mismatches
      |FROM agg ORDER BY name, series""".stripMargin

  /** q40: remote-write wire encode — one snappy'd protobuf WriteRequest per
    * ≤1000-sample batch per tenant, with the series/sample census re-derived
    * by DECODING the emitted bytes in-query (decode_ok proves the roundtrip;
    * the counts have a DuckDB oracle).
    */
  def remoteWriteEncode(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.RemoteWrite
    val e = EventQueries.events(s, dir)
    val tsUs = unix_micros(col("ts").cast("timestamp"))
    val samples = e.select(
      col("event_type").as("tenant"),
      tsUs.as("ts"),
      col("event_id").as("seq"),
      lit("graft_value").as("name"),
      map(lit("type"), col("event_type"),
        lit("user"), col("user_id").cast("string")).as("tags"),
      col("value"),
      (tsUs / 1000).cast("long").as("ts_ms"),
      lit("gauge").as("kind"))
    // known Jan-2024 µs domain — the caller-bounds escape q33/q36/q54 already
    // use: batch ids are chunking-invariant, and the supplied superset skips
    // the blocking min/max job's full extra pass over the sample projection
    RemoteWrite.encodeBatches(samples, maxEvents = 1000,
      tsBounds = Some((1704067200000000L, 1706745600000000L)))
      .select(col("tenant"), col("batch_id"),
        col("n_series").cast("long").as("n_series"),
        col("n_samples").cast("long").as("n_samples"),
        // single-UDF boolean: one decode per batch, structurally — the
        // struct-field form let the optimizer duplicate the census UDF into
        // both comparison branches (q40 measured 2.7× r3 in BENCH_r04)
        RemoteWrite.decodeMatches(col("request"), col("n_series"),
          col("n_samples")).as("decode_ok"))
      .orderBy(col("tenant"), col("batch_id"))
  }

  /** q40 oracle: batch packing census (series = distinct user within the
    * batch; type and __name__ are constant per tenant); decode_ok must be
    * uniformly true on the Spark side.
    */
  val remoteWriteEncodeOracle: String =
    """WITH b AS (SELECT event_type AS tenant, user_id,
      |  ((row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)) - 1) // 1000
      |    AS batch_id
      |  FROM events)
      |SELECT tenant, batch_id, count(DISTINCT user_id) AS n_series,
      |  count(*) AS n_samples, true AS decode_ok
      |FROM b GROUP BY 1, 2 ORDER BY tenant, batch_id""".stripMargin

  /** q43: full exposition body — # HELP/# TYPE headers + gauge sample lines
    * for the latest value per (type, user) series, string-compared line by
    * line against a DuckDB render of the same body. Values are floored so
    * both engines print the identical "N.0" form (double shortest-repr
    * algorithms may differ on arbitrary fractions).
    */
  def exporterExpo(s: SparkSession, dir: String): DataFrame = {
    val latest = EventQueries.events(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(max_by(col("value"), struct(col("ts"), col("event_id"))).as("v"))
      .select(
        concat(lit("graft_"), col("event_type")).as("name"),
        map(lit("user"), col("user_id").cast("string")).as("tags"),
        lit("gauge").as("kind"),
        floor(col("v")).cast("double").as("m_sum"),
        lit(1L).as("m_count"),
        array().cast("array<bigint>").as("m_buckets"))
    graft.functions.Exporter.renderExposition(latest)
  }

  /** q44: VTL parse_url + parse_query end-to-end — URLs synthesized from
    * event columns, parsed back, aggregated by the parsed components; the
    * oracle rebuilds the expected components from the raw columns.
    */
  def parseQueryUrl(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Vtl
    val e = EventQueries.events(s, dir)
    val k = get_json_object(col("props"), "$.k").cast("long")
    val url = concat(lit("https://h"), pmod(col("user_id"), lit(5)),
      lit(".example.com:8080/ev/"), col("event_type"),
      lit("?k="), k, lit("&t="), col("event_type"))
    // the parsed maps ride NAMED aliases referenced multiple times, so
    // CollapseProject cannot inline the UDF subtree into each element_at —
    // the inline form evaluated parseUrl once per extracted component
    // (round 6; the guide §4.4 duplication class, fixed structurally
    // instead of via asNondeterministic)
    e.withColumn("_u", Vtl.parseUrl(url))
      .withColumn("_q", Vtl.parseQuery(element_at(col("_u"), "query")))
      .select(
        element_at(col("_u"), "host").as("host"),
        element_at(col("_u"), "path").as("path"),
        element_at(col("_u"), "port").as("port"),
        element_at(col("_q"), "k")(0).cast("long").as("kq"))
      .groupBy(col("host"), col("path"))
      .agg(count(lit(1)).as("cnt"), sum(col("kq")).as("k_sum"),
        max(col("port")).as("port"))
      .orderBy(col("host"), col("path"))
  }

  val parseQueryUrlOracle: String =
    """SELECT 'h' || (user_id % 5) || '.example.com' AS host,
      |  '/ev/' || event_type AS path, count(*) AS cnt,
      |  sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS k_sum,
      |  '8080' AS port
      |FROM events GROUP BY 1, 2 ORDER BY host, path""".stripMargin

  /** q45: pushgateway grouping-label enrichment — grouping labels parsed
    * from synthesized request paths override the pushed samples' own tags
    * (prometheus_pushgateway.rs:98-179 + the grouping contract), then the
    * enriched series are counted by canonical identity.
    */
  def pushgatewayGrouping(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Scrape
    val e = EventQueries.events(s, dir)
    val path = concat(lit("/metrics/job/ingest/type/"), col("event_type"),
      lit("/shard/"), pmod(col("user_id"), lit(4)))
    val sampleTags = map(
      lit("type"), lit("pushed"), // overridden by the grouping label
      lit("app"), concat(lit("A"), pmod(col("user_id"), lit(2))))
    e.select(Scrape.applyGroupingLabels(sampleTags, Scrape.groupingLabels(path)).as("tags"))
      .groupBy(TagOps.canonicalTags(col("tags")).as("series"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("series"))
  }

  val pushgatewayGroupingOracle: String =
    """SELECT 'app=A' || (user_id % 2) || ',job=ingest,shard=' || (user_id % 4) ||
      |  ',type=' || event_type AS series, count(*) AS cnt
      |FROM events GROUP BY 1 ORDER BY series""".stripMargin

  val exporterExpoOracle: String =
    """WITH latest AS (SELECT event_type, user_id, arg_max(value, ts) AS v
      |                FROM events GROUP BY 1, 2),
      |names AS (SELECT DISTINCT event_type FROM events),
      |lines AS (
      |  SELECT 'graft_' || event_type || '{user="' || user_id || '"} ' ||
      |         floor(v)::DOUBLE::VARCHAR AS line
      |  FROM latest
      |  UNION ALL
      |  SELECT '# HELP graft_' || event_type || ' ' FROM names
      |  UNION ALL
      |  SELECT '# TYPE graft_' || event_type || ' gauge' FROM names)
      |SELECT line FROM lines ORDER BY line""".stripMargin
}
