package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Prometheus remote-write WriteRequest wire encode: proto3 + raw-snappy,
  * produced as a BinaryType column per batch — the sink's defining output
  * (/root/reference/src/sinks/prometheus_remote_write.rs:144-207 encode +
  * snap_block; message schema
  * /root/reference/lib/prometheus/proto/prometheus-remote.proto).
  *
  * The protobuf writer is hand-rolled against the public proto3 wire spec
  * (same pattern as compress.BitWriter): varints, 64-bit doubles, and
  * length-delimited submessages — no codegen, no extra deps. Labels carry
  * `__name__` and are sorted by (name, value) exactly like the reference's
  * `make_labels` (/root/reference/src/common/prometheus.rs:133-165); series
  * are ordered by their canonical label string and samples by (timestamp,
  * seq), so the bytes are deterministic under any partitioning.
  *
  * Scale shape: batches are bounded (≤ maxEvents rows, Exporter.assignBatches'
  * two-level packing), so the per-batch collect_list + encode UDF touches a
  * bounded buffer per task — the same bounded-page pattern as the Gorilla
  * encoder. A decoder is included so the roundtrip is verifiable in-query.
  */
object RemoteWrite {

  final case class PromLabel(name: String, value: String)
  final case class PromSample(value: Double, timestampMs: Long)
  final case class PromTimeSeries(labels: Seq[PromLabel], samples: Seq[PromSample])
  final case class PromMetadata(metricType: Int, family: String)
  final case class PromWriteRequest(
      timeseries: Seq[PromTimeSeries], metadata: Seq[PromMetadata])

  /** MetricMetadata.MetricType enum values (prometheus-remote.proto:28-37). */
  val KindToType: Map[String, Int] =
    Map("counter" -> 1, "gauge" -> 2, "histogram" -> 3, "summary" -> 5)

  // ---- proto3 wire writer ----

  private final class ProtoWriter {
    private val out = new java.io.ByteArrayOutputStream(256)
    def varint(vIn: Long): Unit = {
      var v = vIn
      while ((v & ~0x7FL) != 0L) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    private def key(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def str(field: Int, s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      key(field, 2); varint(b.length.toLong); out.write(b, 0, b.length)
    }
    def int64(field: Int, v: Long): Unit = { key(field, 0); varint(v) }
    def double(field: Int, v: Double): Unit = {
      key(field, 1)
      var bits = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { out.write((bits & 0xFF).toInt); bits >>>= 8; i += 1 }
    }
    def message(field: Int, body: ProtoWriter): Unit = {
      val b = body.toBytes
      key(field, 2); varint(b.length.toLong); out.write(b, 0, b.length)
    }
    def toBytes: Array[Byte] = out.toByteArray
  }

  /** Encode one WriteRequest (uncompressed protobuf). */
  def encode(req: PromWriteRequest): Array[Byte] = {
    val w = new ProtoWriter
    req.timeseries.foreach { ts =>
      val tw = new ProtoWriter
      ts.labels.foreach { l =>
        val lw = new ProtoWriter
        lw.str(1, l.name); lw.str(2, l.value)
        tw.message(1, lw)
      }
      ts.samples.foreach { s =>
        val sw = new ProtoWriter
        sw.double(1, s.value); sw.int64(2, s.timestampMs)
        tw.message(2, sw)
      }
      w.message(1, tw)
    }
    req.metadata.foreach { m =>
      val mw = new ProtoWriter
      mw.int64(1, m.metricType.toLong); mw.str(2, m.family)
      w.message(3, mw)
    }
    w.toBytes
  }

  def compress(bytes: Array[Byte]): Array[Byte] = org.xerial.snappy.Snappy.compress(bytes)
  def uncompress(bytes: Array[Byte]): Array[Byte] = org.xerial.snappy.Snappy.uncompress(bytes)

  // ---- proto3 wire reader (for roundtrip verification) ----

  private final class ProtoReader(bytes: Array[Byte], from: Int, until: Int) {
    private var pos = from
    def hasNext: Boolean = pos < until
    def varint(): Long = {
      var shift = 0; var v = 0L
      var b = 0x80
      while ((b & 0x80) != 0) {
        require(pos < until, "varint overruns buffer")
        b = bytes(pos) & 0xFF; pos += 1
        v |= (b & 0x7FL) << shift; shift += 7
      }
      v
    }
    /** Returns (field, wire); positions at the payload. */
    def tag(): (Int, Int) = { val k = varint(); ((k >>> 3).toInt, (k & 7).toInt) }
    def fixed64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (bytes(pos) & 0xFFL) << (8 * i); pos += 1; i += 1 }
      v
    }
    def lenDelim(): (Int, Int) = {
      val len = varint().toInt
      val r = (pos, pos + len)
      require(r._2 <= until, "length-delimited field overruns buffer")
      pos = r._2
      r
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => pos += 8
      case 2 => lenDelim(); ()
      case other => throw new IllegalArgumentException(s"unsupported wire type $other")
    }
  }

  private def utf8(bytes: Array[Byte], from: Int, until: Int): String =
    new String(bytes, from, until - from, java.nio.charset.StandardCharsets.UTF_8)

  /** Decode an (uncompressed) WriteRequest — inverse of [[encode]]. */
  def decode(bytes: Array[Byte]): PromWriteRequest = {
    def readLabel(b: Array[Byte], from: Int, until: Int): PromLabel = {
      val r = new ProtoReader(b, from, until)
      var name = ""; var value = ""
      while (r.hasNext) r.tag() match {
        case (1, 2) => val (f, u) = r.lenDelim(); name = utf8(b, f, u)
        case (2, 2) => val (f, u) = r.lenDelim(); value = utf8(b, f, u)
        case (_, w) => r.skip(w)
      }
      PromLabel(name, value)
    }
    def readSample(b: Array[Byte], from: Int, until: Int): PromSample = {
      val r = new ProtoReader(b, from, until)
      var v = 0.0; var ts = 0L
      while (r.hasNext) r.tag() match {
        case (1, 1) => v = java.lang.Double.longBitsToDouble(r.fixed64())
        case (2, 0) => ts = r.varint()
        case (_, w) => r.skip(w)
      }
      PromSample(v, ts)
    }
    def readSeries(b: Array[Byte], from: Int, until: Int): PromTimeSeries = {
      val r = new ProtoReader(b, from, until)
      val labels = Seq.newBuilder[PromLabel]
      val samples = Seq.newBuilder[PromSample]
      while (r.hasNext) r.tag() match {
        case (1, 2) => val (f, u) = r.lenDelim(); labels += readLabel(b, f, u)
        case (2, 2) => val (f, u) = r.lenDelim(); samples += readSample(b, f, u)
        case (_, w) => r.skip(w)
      }
      PromTimeSeries(labels.result(), samples.result())
    }
    def readMeta(b: Array[Byte], from: Int, until: Int): PromMetadata = {
      val r = new ProtoReader(b, from, until)
      var t = 0; var fam = ""
      while (r.hasNext) r.tag() match {
        case (1, 0) => t = r.varint().toInt
        case (2, 2) => val (f, u) = r.lenDelim(); fam = utf8(b, f, u)
        case (_, w) => r.skip(w)
      }
      PromMetadata(t, fam)
    }
    val r = new ProtoReader(bytes, 0, bytes.length)
    val series = Seq.newBuilder[PromTimeSeries]
    val meta = Seq.newBuilder[PromMetadata]
    while (r.hasNext) r.tag() match {
      case (1, 2) => val (f, u) = r.lenDelim(); series += readSeries(bytes, f, u)
      case (3, 2) => val (f, u) = r.lenDelim(); meta += readMeta(bytes, f, u)
      case (_, w) => r.skip(w)
    }
    PromWriteRequest(series.result(), meta.result())
  }

  /** Build a WriteRequest from flat samples: group by sorted label set
    * (labels = tags + __name__, sorted by (name, value) per make_labels),
    * samples ordered by (timestampMs, seq), series by their label key,
    * metadata one entry per (family, kind), sorted.
    */
  def buildRequest(
      rows: Seq[(String, Map[String, String], Double, Long, Long, String)])
      : PromWriteRequest = {
    // row = (name, tags, value, tsMs, seq, kind)
    val bySeries = rows.groupBy { case (name, tags, _, _, _, _) =>
      (tags + ("__name__" -> name)).toSeq.sorted
    }
    val series = bySeries.toSeq
      .sortBy { case (labels, _) => labels.map(l => s"${l._1}=${l._2}").mkString(",") }
      .map { case (labels, rs) =>
        PromTimeSeries(
          labels.map { case (k, v) => PromLabel(k, v) },
          rs.sortBy { case (_, _, _, tsMs, seq, _) => (tsMs, seq) }
            .map { case (_, _, v, tsMs, _, _) => PromSample(v, tsMs) })
      }
    val meta = rows.map { case (name, _, _, _, _, kind) =>
      PromMetadata(KindToType.getOrElse(kind, 0), name)
    }.distinct.sortBy(m => (m.family, m.metricType))
    PromWriteRequest(series, meta)
  }

  /** Spark surface: pack samples into ≤maxEvents batches per tenant
    * (Exporter.assignBatches) and encode one snappy'd WriteRequest per batch.
    *
    * Required columns: tenant, ts (orderable), seq (unique), name,
    * tags (map<string,string>), value (double), ts_ms (long), kind (string).
    * Output: (tenant, batch_id, request binary, n_series, n_samples).
    */
  def encodeBatches(df: DataFrame, maxEvents: Int = 1000, numChunks: Int = 64,
      tsBounds: Option[(Long, Long)] = None): DataFrame = {
    val encodeUdf = udf { rows: Seq[org.apache.spark.sql.Row] =>
      val typed = rows.map(r => (
        r.getString(0), r.getMap[String, String](1).toMap, r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
      compress(encode(buildRequest(typed)))
    }
    Exporter.assignBatches(df, "tenant", "ts", "seq", maxEvents, numChunks,
        tsBounds = tsBounds)
      .groupBy(col("tenant"), col("batch_id"))
      .agg(collect_list(struct(col("name"), col("tags"), col("value"),
        col("ts_ms"), col("seq"), col("kind"))).as("_rows"))
      .select(col("tenant"), col("batch_id"),
        encodeUdf(col("_rows")).as("request"),
        size(array_distinct(transform(col("_rows"),
          r => TagOps.canonicalTags(map_concat(r("tags"),
            map(lit("__name__"), r("name"))))))).as("n_series"),
        size(col("_rows")).as("n_samples"))
  }

  /** Decode-side census of an encoded request column — proves in-query that
    * the bytes roundtrip (series/sample counts re-derived from the wire).
    */
  def decodedCensus(request: Column): Column = {
    val censusUdf = udf { bytes: Array[Byte] =>
      val req = decode(uncompress(bytes))
      (req.timeseries.size, req.timeseries.map(_.samples.size).sum)
    }
    censusUdf(request)
  }

  /** Decode-roundtrip proof as ONE boolean UDF: decodes `request` once and
    * compares the census against the expected counts inside the same call.
    * Prefer this over comparing [[decodedCensus]]'s struct fields column-by-
    * column — extracting two fields of a UDF-produced struct lets the
    * optimizer duplicate the UDF into each projection branch, decoding (and
    * snappy-uncompressing) every batch twice.
    */
  def decodeMatches(request: Column, nSeries: Column, nSamples: Column): Column = {
    val okUdf = udf { (bytes: Array[Byte], series: Long, samples: Long) =>
      val req = decode(uncompress(bytes))
      req.timeseries.size.toLong == series &&
        req.timeseries.map(_.samples.size).sum.toLong == samples
    }
    okUdf(request, nSeries.cast("long"), nSamples.cast("long"))
  }
}
