package graft.tiers

import graft.lake.LakeTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The continuous-aggregate cascade: raw observations → 1m → 1h → 1d tier
  * tables, each materialized in the lake layer with per-partition manifests so
  * any rerun resumes from the last committed partition (north_rule;
  * SURVEY.md §7.2/§7.3).
  *
  * Partition key = "seriesBucket-day": bucketed series-hash × time, per the
  * north rule's partitioning clause. Each tier reads only the committed
  * partitions of the previous tier, so a torn write never propagates.
  */
object TierCascade {

  final case class TierResult(name: String, table: LakeTable, newPartitions: Seq[String])

  def partKey(seriesBuckets: Int): org.apache.spark.sql.Column =
    concat(
      pmod(xxhash64(col("series")), lit(seriesBuckets.toLong)).cast("string"),
      lit("-"),
      date_format(to_utc_timestamp(timestamp_seconds(col("bucket")), "UTC"), "yyyyMMdd"))

  /** Run the full cascade. `obs` must provide (series, ts, seq, value).
    * @param salts >1 enables the two-phase salted rollup for hot series.
    */
  def run(
      spark: SparkSession,
      obs: DataFrame,
      basePath: String,
      seriesBuckets: Int = 8,
      salts: Int = 1): Seq[TierResult] = {

    val t1m = if (salts > 1) TierRollup.fromObsSalted(obs, 60L, salts)
              else TierRollup.fromObs(obs, 60L)
    val lake1m = new LakeTable(spark, basePath, "tier_1m", "pk")
    val new1m = lake1m.append(t1m.withColumn("pk", partKey(seriesBuckets)),
      lineage = "raw->1m rollup bucket=60s")

    val lake1h = new LakeTable(spark, basePath, "tier_1h", "pk")
    val t1h = TierRollup.mergeTier(lake1m.read().drop("pk"), 3600L)
    val new1h = lake1h.append(t1h.withColumn("pk", partKey(seriesBuckets)),
      lineage = "1m->1h mergeTier bucket=3600s")

    val lake1d = new LakeTable(spark, basePath, "tier_1d", "pk")
    val t1d = TierRollup.mergeTier(lake1h.read().drop("pk"), 86400L)
    val new1d = lake1d.append(t1d.withColumn("pk", partKey(seriesBuckets)),
      lineage = "1h->1d mergeTier bucket=86400s")

    Seq(TierResult("1m", lake1m, new1m), TierResult("1h", lake1h, new1h),
      TierResult("1d", lake1d, new1d))
  }

  /** Retention sweep: per-tier TTLs (seconds of bucket age vs the tier's
    * high-water mark), enforced as partition-level expire (day granularity —
    * a partition is dropped when its whole day is past TTL).
    */
  def retention(results: Seq[TierResult], ttls: Map[String, Long]): Map[String, Seq[String]] = {
    results.flatMap { tr =>
      ttls.get(tr.name).map { ttl =>
        val committed = tr.table.committedPartitions()
        if (committed.isEmpty) tr.name -> Seq.empty[String]
        else {
          def dayOf(p: String): Long = {
            val d = p.substring(p.indexOf('-') + 1)
            java.time.LocalDate.parse(d, java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
              .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
          }
          val hwm = committed.map(dayOf).max
          tr.name -> tr.table.expire(p => dayOf(p) + 86400 <= hwm - ttl)
        }
      }
    }.toMap
  }
}
