package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zero-extra-pass skew-guard audit, shared by the LSH banding operators
  * (MinHash, sign-LSH): the dropped-bucket census rides the main query as a
  * CollectMetrics observation ([[org.apache.spark.sql.Dataset.observe]]) and
  * is logged by a once-per-session listener when the consuming action
  * completes. The round-3 form ran a dedicated census action per operator
  * call, which recomputed the operator's full signature pipeline (~1/3 of
  * MinHash dedup's measured wall; at 100 TB an entire extra corpus pass).
  *
  * NO SILENT CAPS still holds: every consuming action of an audited frame
  * logs the census. What changes is WHEN — after the action instead of
  * before pair generation. Delivery caveats (the price of zero extra
  * passes): the listener rides Spark's async listener bus, so a driver that
  * exits without `SparkSession.stop()` can drop the queued log line, and a
  * FAILED action logs only what its completed stages observed. Callers that
  * must refuse to proceed on skew — or need the census even on abandoned
  * runs — use the eager form directly, e.g.
  * `Dedup.droppedBuckets(Dedup.minhashBuckets(...), maxBucket)`.
  */
object SkewAudit {

  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)
  // weak keys: a stopped session must not be pinned forever by the audit
  // registry (a long-lived JVM cycling sessions — test suites, notebooks —
  // would otherwise accumulate stopped-session object graphs)
  private val registered =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Attach the oversize-bucket census to `buckets`: rows where
    * `sizeCol > maxBucket` are counted (and their sizes summed) into an
    * observation named `graft_skew_<op>_<n>` — unique per call, so two
    * audited operators composed into one query don't collide.
    */
  def observed(buckets: DataFrame, op: String, sizeCol: Column, maxBucket: Int): DataFrame = {
    ensureLogger(buckets.sparkSession)
    buckets.observe(
      s"graft_skew_${op}_${seq.incrementAndGet()}",
      sum(when(sizeCol > maxBucket, 1L).otherwise(0L)).as("dropped_buckets"),
      sum(when(sizeCol > maxBucket, sizeCol.cast("long")).otherwise(0L))
        .as("dropped_doc_slots"),
      lit(maxBucket.toLong).as("max_bucket"))
  }

  /** One listener per session that logs any `graft_skew_*` observation with
    * dropped buckets. Listener registration is idempotent per session.
    */
  private def ensureLogger(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        private def logCensus(qe: org.apache.spark.sql.execution.QueryExecution): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_skew_")) {
              def l(field: String): Long =
                Option(row.getAs[java.lang.Long](field)).map(_.longValue).getOrElse(0L)
              val (nDropped, slots) = (l("dropped_buckets"), l("dropped_doc_slots"))
              if (nDropped > 0)
                org.slf4j.LoggerFactory.getLogger(getClass).warn(
                  s"$name: skew guard dropped $nDropped buckets > ${l("max_bucket")} docs " +
                    s"($slots doc slots) — dup-dense buckets excluded from pair generation")
            }
          }
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
          logCensus(qe)
        // a FAILED action may still have accumulated the census (the bucket
        // stage can complete and cut before a downstream stage dies) — log
        // whatever was observed rather than dropping the trail
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit =
          logCensus(qe)
      })
    }
}
