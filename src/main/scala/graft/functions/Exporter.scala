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

  /** Escape a label VALUE for the exposition text format: backslash, double
    * quote and newline get backslash-escaped (the write-side mirror of
    * PromText.parseLine's unescaping — the reference escapes on write too).
    * Keys are metric-name charset by spec and need no escaping.
    */
  private def escExpoValue(v: Column): Column = {
    val b = regexp_replace(v, "\\\\", "\\\\\\\\") // \  -> \\
    val q = regexp_replace(b, "\"", "\\\\\"") // "  -> \"
    regexp_replace(q, "\n", "\\\\n") // LF -> \n
  }

  /** Canonical label string: "k1=\"v1\",k2=\"v2\"" sorted by key; values are
    * exposition-escaped so the rendered body roundtrips through the parser.
    */
  def canonicalLabels(tags: Column): Column =
    array_join(
      transform(array_sort(map_entries(tags)),
        e => concat(e("key"), lit("=\""), escExpoValue(e("value")), lit("\""))),
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
      maxEvents: Int = 1000, numChunks: Int = 64,
      tsBounds: Option[(Long, Long)] = None): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    // order-preserving long form of the event time (µs for timestamps;
    // TIMESTAMP_NTZ has no direct long cast)
    val tRaw = df.schema(tsCol).dataType match {
      case TimestampNTZType => unix_micros(col(tsCol).cast("timestamp"))
      case TimestampType => unix_micros(col(tsCol))
      case _ => col(tsCol).cast("long")
    }
    // bounds from one tiny reduce, or caller-supplied (skips the blocking
    // job when the window is already known — e.g. per-partition batch jobs)
    val Array(lo, hi) = tsBounds match {
      case Some((l, h)) => require(h >= l, s"tsBounds [$l, $h] inverted"); Array(l, h)
      case None =>
        val r = df.agg(min(tRaw), max(tRaw)).head()
        if (r.isNullAt(0)) Array(0L, 0L) else Array(r.getLong(0), r.getLong(1))
    }
    // null / uncastable event times coalesce to a below-range sentinel so
    // those rows pack FIRST (nulls-first, like the single-window formulation
    // ordering) instead of getting a null _chunk and vanishing in the
    // offsets join. lo is a real observed min (or 0), so lo-1 cannot
    // underflow for any physical timestamp.
    val t = coalesce(tRaw, lit(lo - 1L))
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
      maxEvents: Int = 1000, tsBounds: Option[(Long, Long)] = None): DataFrame =
    assignBatches(df, tenantCol, tsCol, seqCol, maxEvents, tsBounds = tsBounds)
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

  private def fmtUpper(u: Double): String =
    if (u.isPosInfinity) "+Inf" else u.toString

  /** Full exposition body
    * (/root/reference/src/sinks/prometheus_exporter.rs:322-417): one
    * `# HELP` + `# TYPE` header per metric family, then its series in
    * canonical label order; histograms expand to `_bucket{le=..}` lines (the
    * `le` label appended AFTER the sorted tags, like write_sample's
    * `additional` label) plus `_sum`/`_count`. Expired entries — rows whose
    * `expiresAtCol` is behind `now` — are skipped but still hold the header
    * slot if live siblings exist, exactly like the reference's per-entry
    * `expired_at < now` check inside the name loop.
    *
    * Input rows use the unified metric shape (Metricalize output):
    * (name, tags, kind, m_sum, m_count, m_buckets); `ladder` gives the
    * histogram uppers for m_buckets. Output: one `line` column, body order.
    *
    * Scale shape: line generation is a codegen'd array projection + explode;
    * the only ordering is the final body sort (a real exporter shards the
    * body by name range; at query scale one global sort is the contract).
    */
  def renderExposition(
      df: DataFrame,
      ladder: Seq[Double] = Nil,
      descriptions: Map[String, String] = Map.empty,
      expiresAtCol: Option[String] = None,
      now: Option[Column] = None,
      quantiles: Seq[Double] = Nil): DataFrame = {
    val live = (expiresAtCol, now) match {
      case (Some(e), Some(n)) => df.filter(col(e) >= n)
      case _ => df
    }
    val labels = canonicalLabels(col("tags"))
    def sample(suffix: String, extra: Option[String], v: Column): Column = {
      val nm = concat(col("name"), lit(suffix))
      val lbl = extra match {
        case Some(x) => when(labels === "", lit(x)).otherwise(concat(labels, lit(","), lit(x)))
        case None => labels
      }
      when(lbl === "", concat(nm, lit(" "), v.cast("string")))
        .otherwise(concat(nm, lit("{"), lbl, lit("} "), v.cast("string")))
    }
    val bucketLines = ladder.zipWithIndex.map { case (u, i) =>
      struct(lit(i).as("sub"),
        sample("_bucket", Some(s"""le="${fmtUpper(u)}""""), col("m_buckets")(i)).as("text"))
    }
    // summary quantile lines (write_summary, exporter.rs:289-310): unsuffixed
    // name + quantile label, values from the m_quantiles double array
    val quantileLines = quantiles.zipWithIndex.map { case (qv, i) =>
      struct(lit(i).as("sub"),
        sample("", Some(s"""quantile="${qv.toString}""""), col("m_quantiles")(i)).as("text"))
    }
    val sumCount = Seq(
      struct(lit(1000).as("sub"), sample("_sum", None, col("m_sum")).as("text")),
      struct(lit(1001).as("sub"), sample("_count", None, col("m_count")).as("text")))
    val lines =
      when(col("kind") === "histogram", array(bucketLines ++ sumCount: _*))
        .otherwise(
          if (quantiles.isEmpty)
            when(col("kind") === "summary", array(sumCount: _*))
              .otherwise(array(struct(lit(0).as("sub"),
                sample("", None, col("m_sum")).as("text"))))
          else
            when(col("kind") === "summary", array(quantileLines ++ sumCount: _*))
              .otherwise(array(struct(lit(0).as("sub"),
                sample("", None, col("m_sum")).as("text")))))
    val body = live
      .select(col("name"), labels.as("labels"), explode(lines).as("l"))
      .select(col("name"), col("labels"), col("l.sub").as("sub"), col("l.text").as("text"))

    // headers: families are live iff they still have at least one live row;
    // kind string per MetricValue (Sum -> "counter", exporter.rs:363-369)
    val kindStr = when(col("kind") === "counter", "counter").otherwise(col("kind"))
    // HELP text escapes '\' and newline per the exposition spec (label values
    // additionally escape '"' — handled in canonicalLabels)
    val descCol = descriptions.foldLeft(lit(""): Column) { case (acc, (n, d)) =>
      when(col("name") === n, lit(d.replace("\\", "\\\\").replace("\n", "\\n"))).otherwise(acc)
    }
    // max(), not first(): a family whose rows disagree on kind (the mismatch
    // case metricalize models) must render ONE deterministic header under any
    // partitioning — max picks the lexicographically-last kind string
    val headers = live
      .groupBy(col("name"))
      .agg(max(kindStr).as("_kind"), max(descCol).as("_desc"))
      .select(col("name"), lit("").as("labels"),
        array(
          struct(lit(-2).as("sub"),
            concat(lit("# HELP "), col("name"), lit(" "), col("_desc")).as("text")),
          struct(lit(-1).as("sub"),
            concat(lit("# TYPE "), col("name"), lit(" "), col("_kind")).as("text"))).as("ls"))
      .select(col("name"), col("labels"), explode(col("ls")).as("l"))
      .select(col("name"), col("labels"), col("l.sub").as("sub"), col("l.text").as("text"))

    body.unionByName(headers)
      .orderBy(col("name"), col("labels"), col("sub"))
      .select(col("text").as("line"))
  }
}
