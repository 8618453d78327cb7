package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** geoip-style longest-prefix / range enrichment
  * (/root/reference/src/transforms/geoip.rs:22-60): the reference mmaps a
  * MaxMind database and looks up the source IP per event. A MaxMind city DB
  * is a few-hundred-MB driver-loadable artifact of NON-OVERLAPPING address
  * ranges, so the Spark-native shape is: collect the (start, end, value)
  * ranges once, broadcast the sorted arrays, and binary-search per row inside
  * a UDF — one O(log n) probe per event, no join, no shuffle. (An equality
  * broadcast join — the q34 dim-join — cannot model CIDR containment.)
  */
object GeoIp {

  /** Range lookup column: for each `ip` (u32 as long), the `value` of the
    * unique range with lo <= ip <= hi, else null.
    *
    * @param ranges non-overlapping (lo, hi, value) rows; must fit the driver
    *               (MaxMind-shaped: bounded artifact, not data-sized)
    */
  def lookupRange(ip: Column, ranges: Seq[(Long, Long, String)]): Column =
    lookupRangeBc(ip, ranges, None)

  /** As [[lookupRange]], but the sorted range arrays ship as a REAL
    * `SparkContext.broadcast` (one copy per executor, torrent-distributed)
    * instead of riding the UDF closure into every task binary — the right
    * shape for a few-hundred-MB MaxMind artifact. `spark` is taken from the
    * caller because a bare Column has no session.
    */
  private[ops] def lookupRangeBc(ip: Column, ranges: Seq[(Long, Long, String)],
      spark: Option[org.apache.spark.sql.SparkSession]): Column = {
    val sorted = ranges.sortBy(_._1).toArray
    require(sorted.iterator.sliding(2).withPartial(false)
      .forall { case Seq(a, b) => a._2 < b._1 },
      "ranges must be non-overlapping and gap-separated")
    val los = sorted.map(_._1)
    val his = sorted.map(_._2)
    val vals = sorted.map(_._3)
    val probe = spark match {
      case Some(s) =>
        val bc = s.sparkContext.broadcast((los, his, vals))
        udf { (x: java.lang.Long) =>
          val (blos, bhis, bvals) = bc.value
          lookupIn(blos, bhis, bvals, x)
        }
      case None => // closure capture: fine for test/dim-sized range tables
        udf { (x: java.lang.Long) => lookupIn(los, his, vals, x) }
    }
    probe(ip)
  }

  /** Last range with lo <= x, hit iff x <= hi — one binary search. */
  private def lookupIn(los: Array[Long], his: Array[Long], vals: Array[String],
      x: java.lang.Long): String = {
    if (x == null) null
    else {
      var l = 0; var r = los.length - 1; var found = -1
      while (l <= r) {
        val m = (l + r) >>> 1
        if (los(m) <= x) { found = m; l = m + 1 } else r = m - 1
      }
      if (found >= 0 && x <= his(found)) vals(found) else null
    }
  }

  /** Enrich `df` with a `geo` column looked up from a ranges DataFrame of
    * (lo, hi, value) — the dim side is collected and broadcast via the UDF
    * closure; misses map to `missValue`.
    */
  def enrich(df: DataFrame, ipCol: Column, rangesDf: DataFrame,
      missValue: String = "unknown"): DataFrame = {
    val ranges = rangesDf.select(col("lo").cast("long"), col("hi").cast("long"),
      col("value").cast("string"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    df.withColumn("geo",
      coalesce(lookupRangeBc(ipCol, ranges, Some(df.sparkSession)), lit(missValue)))
  }
}
