package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trace analytics (`Event::Trace`,
  * /root/reference/lib/event/src/lib.rs:42-46): the reference models OTel
  * spans — trace/span/parent ids, name, kind, start/end nanos, attributes,
  * status (/root/reference/lib/event/src/trace/span.rs:199-245) — as the
  * third event family beside logs and metrics. The Spark-side surface is a
  * span frame plus the three analyses a trace store runs at scale: trace
  * assembly (group by trace), self-time attribution (span duration minus its
  * children — one keyed aggregate + one equi-join), and RED rollups
  * (rate/errors/duration per service × time bucket — one hash aggregate).
  *
  * Spans are derived deterministically from the driver's `events` table with
  * closed-form arithmetic (no window functions), so the DuckDB oracle carries
  * the IDENTICAL derivation as a WITH clause and cannot drift: consecutive
  * runs of 8 events form one trace whose spans link into a binary tree
  * (parent rank = rank/2 — depth 4), duration is exact integer micros from
  * the event value, every 13th span is an error (OTel STATUS_CODE_ERROR = 2).
  *
  * Scale shape (100 TB): all three queries are single hash-shuffle
  * aggregates on bounded keys; self-time adds one shuffle join keyed by
  * (trace_id, span_id) — the natural bucketing key for a span store, so on a
  * bucketed table both sides co-locate and the join is shuffle-free.
  */
object TraceQueries {

  /** The span frame: (trace_id, span_id, parent_span_id, name, kind,
    * start_us, duration_us, end_us, status_code). Root spans carry
    * parent_span_id = 0 (the reference's SpanId::INVALID sentinel,
    * span.rs:202-204 "if this is a root span, then this field must be zero").
    */
  def spans(s: SparkSession, dir: String): DataFrame = {
    val e = EventQueries.events(s, dir)
    val rank = col("event_id") % 8 + lit(1) // 1-based rank within the trace
    e.select(
      concat(lit("t"), floor(col("event_id") / 8).cast("string")).as("trace_id"),
      // ids are event_id + 1: the reference's SpanId::INVALID (= 0) marks
      // roots, so real span ids must be nonzero (span.rs:202-204)
      (col("event_id") + 1).as("span_id"),
      when(rank === 1, lit(0L)).otherwise(
        floor(col("event_id") / 8) * 8 + floor(rank / 2).cast("long")
      ).as("parent_span_id"),
      col("event_type").as("name"),
      // ts is TIMESTAMP_NTZ; the session timezone is pinned UTC everywhere,
      // so the cast below is the same instant DuckDB's epoch_us(ts) reads.
      element_at(
        array(lit("client"), lit("server"), lit("producer"), lit("consumer"), lit("internal")),
        (col("event_id") % 5 + 1).cast("int")).as("kind"),
      unix_micros(col("ts").cast("timestamp")).as("start_us"),
      (floor(col("value") * 1000).cast("long") + 1 + col("event_id") % 997).as("duration_us"),
      (unix_micros(col("ts").cast("timestamp")) + floor(col("value") * 1000).cast("long") + 1
        + col("event_id") % 997).as("end_us"),
      when(col("event_id") % 13 === 0, lit(2)).otherwise(lit(0)).as("status_code"))
  }

  /** The identical derivation as DuckDB SQL, shared by every trace oracle. */
  private val spansSql: String =
    """spans AS (
      |  SELECT
      |    't' || CAST(CAST(floor(event_id / 8) AS BIGINT) AS VARCHAR) AS trace_id,
      |    event_id + 1 AS span_id,
      |    CASE WHEN event_id % 8 = 0 THEN 0
      |         ELSE CAST(floor(event_id / 8) AS BIGINT) * 8
      |              + CAST(floor((event_id % 8 + 1) / 2) AS BIGINT) END AS parent_span_id,
      |    event_type AS name,
      |    ['client','server','producer','consumer','internal'][CAST(event_id % 5 + 1 AS INT)] AS kind,
      |    epoch_us(ts) AS start_us,
      |    CAST(floor(value * 1000) AS BIGINT) + 1 + event_id % 997 AS duration_us,
      |    epoch_us(ts) + CAST(floor(value * 1000) AS BIGINT) + 1 + event_id % 997 AS end_us,
      |    CASE WHEN event_id % 13 = 0 THEN 2 ELSE 0 END AS status_code
      |  FROM events)""".stripMargin

  /** Trace assembly: one row per trace — span count, error count, the root
    * span's name, and the trace wall (max end − min start). One hash
    * aggregate keyed by trace_id; min_by picks the root name deterministically
    * (span_id is unique).
    */
  def traceSummary(s: SparkSession, dir: String): DataFrame =
    spans(s, dir)
      .groupBy(col("trace_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("status_code") === 2, 1L).otherwise(0L)).as("err_spans"),
        min_by(col("name"), col("span_id")).as("root_name"),
        (max(col("end_us")) - min(col("start_us"))).as("trace_dur_us"))
      .orderBy(col("trace_id"))

  val traceSummaryOracle: String =
    s"""WITH $spansSql
       |SELECT trace_id, count(*) AS n_spans,
       |       CAST(sum(CASE WHEN status_code = 2 THEN 1 ELSE 0 END) AS BIGINT) AS err_spans,
       |       arg_min(name, span_id) AS root_name,
       |       max(end_us) - min(start_us) AS trace_dur_us
       |FROM spans GROUP BY trace_id ORDER BY trace_id""".stripMargin

  /** Self-time attribution: a span's self time is its duration minus the sum
    * of its direct children's durations (the flame-graph decomposition).
    * Children aggregate once by (trace_id, parent_span_id), then equi-join
    * back to the span by (trace_id, span_id); per-service totals follow from
    * one more hash aggregate. Invariant (spec-asserted): per trace,
    * sum(self) == the root's duration ± the overlap of asynchronous children
    * — with this fixture's derivation, sum(self) == sum(dur) − sum(non-root
    * dur) == root duration exactly.
    */
  def traceSelfTime(s: SparkSession, dir: String): DataFrame = {
    val sp = spans(s, dir)
    val children = sp.filter(col("parent_span_id") =!= 0)
      .groupBy(col("trace_id").as("c_tid"), col("parent_span_id").as("c_pid"))
      .agg(sum(col("duration_us")).as("child_us"))
    sp.join(children,
        sp("trace_id") === col("c_tid") && sp("span_id") === col("c_pid"), "left")
      .withColumn("self_us", col("duration_us") - coalesce(col("child_us"), lit(0L)))
      .groupBy(col("name"))
      .agg(count(lit(1)).as("spans"), sum(col("self_us")).as("self_us"))
      .orderBy(col("name"))
  }

  val traceSelfTimeOracle: String =
    s"""WITH $spansSql,
       |children AS (
       |  SELECT trace_id AS c_tid, parent_span_id AS c_pid,
       |         CAST(sum(duration_us) AS BIGINT) AS child_us
       |  FROM spans WHERE parent_span_id <> 0 GROUP BY 1, 2)
       |SELECT name, count(*) AS spans,
       |       CAST(sum(duration_us - coalesce(child_us, 0)) AS BIGINT) AS self_us
       |FROM spans s LEFT JOIN children c ON s.trace_id = c.c_tid AND s.span_id = c.c_pid
       |GROUP BY name ORDER BY name""".stripMargin

  /** RED rollup: rate / errors / duration per (service name, minute bucket) —
    * the span→metric transform a trace pipeline feeds its dashboards with.
    * One hash aggregate with map-side partials; the bucket is exact integer
    * division on the span's start micros.
    */
  def traceRed(s: SparkSession, dir: String): DataFrame =
    spans(s, dir)
      .groupBy(col("name"), (expr("start_us div 60000000") * 60).as("bucket"))
      .agg(
        count(lit(1)).as("req"),
        sum(when(col("status_code") === 2, 1L).otherwise(0L)).as("errs"),
        sum(col("duration_us")).as("dur_us"))
      .orderBy(col("name"), col("bucket"))

  val traceRedOracle: String =
    s"""WITH $spansSql
       |SELECT name, (start_us // 60000000) * 60 AS bucket, count(*) AS req,
       |       CAST(sum(CASE WHEN status_code = 2 THEN 1 ELSE 0 END) AS BIGINT) AS errs,
       |       CAST(sum(duration_us) AS BIGINT) AS dur_us
       |FROM spans GROUP BY 1, 2 ORDER BY name, bucket""".stripMargin
}
