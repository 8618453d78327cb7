package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder-prompt first-class op): media payloads
  * travel as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract runs as a partition-batched typed transform.
  *
  * The actual media decode is STUBBED (no image/audio libs in this container,
  * per the builder prompt): `decodeStub` produces deterministic fake features
  * from the bytes. Everything around it — schema, partition batching, the
  * Dataset[MediaRow] → Dataset[MediaFeatures] signature, and the downstream
  * aggregation — is real Spark and tested. Swap `decodeStub` for a real
  * decoder (e.g. a Pandas UDF via mapInPandas on the Python side, or a JNI
  * codec here) without touching the pipeline.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte], // opaque encoded bytes
      width: Int,
      height: Int,
      sample_rate: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      fingerprint: Long,
      feature: Array[Float], // stub "embedding"
      batch_size: Int) // rows seen by this decode batch (proves batching)

  /** STUB decode: deterministic features from the payload bytes — stands in
    * for image decode / resize / frame-sample. Real implementation would
    * decode `payload` per `kind`; the Spark-side contract is identical.
    */
  private def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    val batch = rows.toArray // partition-batch: one decoder init per partition
    val bs = batch.length
    batch.iterator.map { r =>
      var h = 1469598103934665603L // FNV-1a over payload
      var i = 0
      while (i < r.payload.length) { h = (h ^ (r.payload(i) & 0xff)) * 1099511628211L; i += 1 }
      val feat = Array.tabulate(8)(j => ((h >>> (j * 8)) & 0xff).toFloat / 255f)
      MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, h, feat, bs)
    }
  }

  /** Build a deterministic media table from `documents` (text bytes as the
    * opaque payload) and run the decode pipeline: binary column in, typed
    * features out, then a per-kind aggregate.
    */
  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"),
        (pmod(col("doc_id"), lit(640)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"))
      .as[MediaRow]
    val features = media.mapPartitions(decodeStub)
    features.groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        countDistinct(col("fingerprint")).as("distinct_fp"),
        max(col("batch_size")).as("max_batch"))
      .orderBy(col("kind"))
  }
}
