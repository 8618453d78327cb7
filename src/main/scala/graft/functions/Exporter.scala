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
    */
  def assignBatches(df: DataFrame, tenantCol: String, tsCol: String, seqCol: String,
      maxEvents: Int = 1000): DataFrame = {
    val w = Window.partitionBy(col(tenantCol)).orderBy(col(tsCol), col(seqCol))
    df.withColumn("_rn", row_number().over(w))
      .withColumn("batch_id", ((col("_rn") - 1) / maxEvents).cast("long"))
      .drop("_rn")
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
