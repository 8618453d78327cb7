package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sink-side shaping (SURVEY.md §2.1 sinks):
  *
  *  - remote-write batching: partition by tenant, split each tenant's stream
  *    into batches of ≤ maxEvents in (ts, seq) order — the deterministic batch
  *    shape of the prometheus_remote_write sink
  *    (/root/reference/src/sinks/prometheus_remote_write.rs:25-118; defaults
  *    ≤1000 events / 1 s linger at :28-32). The linger timeout is a
  *    processing-time concept; the batch-size split is what shapes output.
  *
  *  - canonical label sort: labels sorted by key before a series is encoded
  *    (/root/reference/src/common/prometheus.rs:155-165) — sort_array over
  *    map_entries.
  *
  *  - exporter text render: Prometheus exposition lines ordered by metric
  *    name then canonical labels (BTreeMap ordering in the reference,
  *    /root/reference/src/sinks/prometheus_exporter.rs:413-417).
  */
object Exporter {

  /** Canonical label string: "k1=\"v1\",k2=\"v2\"" sorted by key. */
  def canonicalLabels(tags: Column): Column =
    array_join(
      transform(array_sort(map_entries(tags)),
        e => concat(e("key"), lit("=\""), e("value"), lit("\""))),
      ",")

  /** Assign remote-write batch ids: within each tenant, events are ordered by
    * (ts, seq) and packed into batches of maxEvents. Returns the frame with
    * (tenant, batch_id) columns.
    *
    * Two-level packing (round-2 rewrite): a row_number() window partitioned
    * by tenant alone makes ONE task sort a whole tenant — a straggler wall at
    * low tenant cardinality. Instead the global rank is composed from
    *  (1) per-(tenant, time-chunk) counts → cumulative offsets, a window over
    *      a tenants×chunks-sized frame only, broadcast-joined back, and
    *  (2) a local row_number() within (tenant, chunk) — parallelism is
    *      tenants × numChunks, and no task ever sorts more than one chunk.
    * The (ts, seq) order is total, so batch ids are identical to the
    * single-window formulation under any partitioning.
    */
  def assignBatches(df: DataFrame, tenantCol: String, tsCol: String, seqCol: String,
      maxEvents: Int = 1000, numChunks: Int = 64): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    // order-preserving long form of the event time (µs for timestamps;
    // TIMESTAMP_NTZ has no direct long cast)
    val t = df.schema(tsCol).dataType match {
      case TimestampNTZType => unix_micros(col(tsCol).cast("timestamp"))
      case TimestampType => unix_micros(col(tsCol))
      case _ => col(tsCol).cast("long")
    }
    val Array(lo, hi) = {
      val r = df.agg(min(t), max(t)).head()
      if (r.isNullAt(0)) Array(0L, 0L) else Array(r.getLong(0), r.getLong(1))
    }
    val chunkW = math.max(1L, (hi - lo) / math.max(1, numChunks) + 1)
    val chunked = df.withColumn("_chunk", floor((t - lo) / chunkW).cast("long"))
    val offsets = chunked
      .groupBy(col(tenantCol), col("_chunk"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_offset",
        coalesce(sum(col("_n")).over(
          Window.partitionBy(col(tenantCol)).orderBy(col("_chunk"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_n")
    val localW = Window.partitionBy(col(tenantCol), col("_chunk")).orderBy(t, col(seqCol))
    chunked
      .join(broadcast(offsets), Seq(tenantCol, "_chunk"))
      .withColumn("_rn", col("_offset") + row_number().over(localW))
      .withColumn("batch_id", ((col("_rn") - 1) / maxEvents).cast("long"))
      .drop("_rn", "_offset", "_chunk")
  }

  /** Batch summary: one row per (tenant, batch) with size and ts span — the
    * shape a WriteRequest would carry.
    */
  def batchSummaries(df: DataFrame, tenantCol: String, tsCol: String, seqCol: String,
      maxEvents: Int = 1000): DataFrame =
    assignBatches(df, tenantCol, tsCol, seqCol, maxEvents)
      .groupBy(col(tenantCol), col("batch_id"))
      .agg(count(lit(1)).as("batch_events"),
        min(col(tsCol)).as("ts_min"), max(col(tsCol)).as("ts_max"))

  /** Render tier rows as Prometheus exposition text, ordered by (name,
    * canonical labels) — the exporter GET /metrics body.
    * Input: (name, tags map, value double).
    */
  def renderText(df: DataFrame): DataFrame =
    df.select(col("name"), canonicalLabels(col("tags")).as("labels"), col("value"))
      .orderBy(col("name"), col("labels"))
      .select(concat(col("name"), lit("{"), col("labels"), lit("} "),
        col("value").cast("string")).as("line"))
}
