package graft.functions

import graft.compress.GorillaCodec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compressed (series, bucket) pages: delta-of-delta + Gorilla XOR bits packed
  * into a BinaryType column (north_rule; SURVEY.md §2.9 / §7.3).
  *
  * The aggregation itself stays built-in (`collect_list` gets partial
  * aggregation; `sort_array` canonicalizes point order to (ts, seq, value)),
  * and only the per-group bit-packing is a scalar UDF over the collected
  * arrays. Page size is bounded by points-per-(series,bucket), which the
  * bucketing keeps small by construction.
  */
object Pages {

  private val encodeUdf = udf { (ts: Seq[Long], vs: Seq[Double]) =>
    GorillaCodec.encode(ts.toArray, vs.toArray)
  }

  private val decodeCheckUdf = udf { (page: Array[Byte], ts: Seq[Long], vs: Seq[Double]) =>
    val decoded: (Array[Long], Array[Double]) = GorillaCodec.decode(page)
    val tsArr: Array[Long] = ts.toArray
    decoded._1.sameElements(tsArr) && decoded._2.length == vs.length &&
      vs.indices.forall(i => java.lang.Double.doubleToRawLongBits(decoded._2(i)) ==
        java.lang.Double.doubleToRawLongBits(vs(i)))
  }

  def encodePage(ts: Column, vs: Column): Column = encodeUdf(ts, vs)
  def roundtripOk(page: Column, ts: Column, vs: Column): Column = decodeCheckUdf(page, ts, vs)

  /** obs (series, ts, seq, value) → one compressed page per (series, bucket). */
  def pagesFromObs(obs: DataFrame, bucketSec: Long): DataFrame = {
    val bucket = (floor(col("ts") / bucketSec) * bucketSec).cast("long").as("bucket")
    obs
      .groupBy(col("series"), bucket)
      .agg(sort_array(collect_list(struct(col("ts"), col("seq"), col("value")))).as("_pts"))
      .select(col("series"), col("bucket"),
        transform(col("_pts"), p => p("ts")).as("_ts"),
        transform(col("_pts"), p => p("value")).as("_vs"))
      .withColumn("page", encodePage(col("_ts"), col("_vs")))
      .select(col("series"), col("bucket"),
        size(col("_ts")).as("n_points"),
        col("page"),
        roundtripOk(col("page"), col("_ts"), col("_vs")).as("roundtrip_ok"))
  }

  /** Pages with raw byte size vs uncompressed size, for compression metrics. */
  def pageStats(pages: DataFrame): DataFrame =
    pages.select(col("series"), col("bucket"), col("n_points"),
      length(col("page")).as("page_bytes"),
      (col("n_points") * 16L).as("raw_bytes"),
      col("roundtrip_ok"))
}
