package graft.ref

import graft.model.RollupPoint
import scala.collection.mutable

/** Single-node reference oracle: a direct Scala transcription of the
  * reference's aggregation semantics, used by ScalaTest to check the Spark
  * plans bit-for-bit (SURVEY.md §5 "Our translation").
  *
  * Semantics transcribed from:
  *  - MetricValue::merge (/root/reference/lib/event/src/metric/mod.rs:42-64):
  *    Sum accumulates; Gauge is last-write-wins; Histogram increments count,
  *    sum, and every cumulative bucket with value <= upper; Summary merge is
  *    a no-op.
  *  - metricalize grouped-merge (/root/reference/src/transforms/metricalize.rs:220-281):
  *    group by series identity, fold observations in order.
  *  - MetricNormalize absolute→delta
  *    (/root/reference/lib/framework/src/sink/buffer/metrics.rs:99-141):
  *    first observation yields None, subsequent yield the diff.
  *
  * Arrival order in the reference is stream order; here the canonical order is
  * (ts, seq) ascending, which the Spark side reproduces via max_by ordering.
  * No Spark dependencies — pure Scala.
  */
object RefRollup {

  /** Roll raw observations into `bucketSec` cells. Values that are integral
    * (the token-count domain) make the f64 sum order-insensitive, so the
    * result is bit-exact under any fold order.
    */
  def rollup(points: Seq[(String, Long, Long, Double)], bucketSec: Long): Seq[RollupPoint] = {
    val acc = mutable.LinkedHashMap.empty[(String, Long), RollupPoint]
    points.sortBy(p => (p._1, p._2, p._3)).foreach { case (series, ts, seq, v) =>
      val bucket = math.floorDiv(ts, bucketSec) * bucketSec
      val key = (series, bucket)
      acc.get(key) match {
        case None =>
          acc(key) = RollupPoint(series, bucket, v, 1L, v, v, v, ts, seq)
        case Some(p) =>
          val isLater = ts > p.lastTs || (ts == p.lastTs && seq > p.lastSeq)
          acc(key) = p.copy(
            sum = p.sum + v, // Sum: s += f (metric/mod.rs:48)
            cnt = p.cnt + 1,
            min = math.min(p.min, v),
            max = math.max(p.max, v),
            // Gauge: last-write-wins (metric/mod.rs:50-52), event-order here
            last = if (isLater) v else p.last,
            lastTs = if (isLater) ts else p.lastTs,
            lastSeq = if (isLater) seq else p.lastSeq)
      }
    }
    acc.values.toSeq
  }

  /** Merge a finer tier into coarser buckets (1m→1h→1d). */
  def mergeTier(finer: Seq[RollupPoint], bucketSec: Long): Seq[RollupPoint] = {
    val acc = mutable.LinkedHashMap.empty[(String, Long), RollupPoint]
    finer.sortBy(p => (p.series, p.bucket)).foreach { p =>
      val bucket = math.floorDiv(p.bucket, bucketSec) * bucketSec
      acc.get((p.series, bucket)) match {
        case None => acc((p.series, bucket)) = p.copy(bucket = bucket)
        case Some(q) =>
          val takeP = p.lastTs > q.lastTs || (p.lastTs == q.lastTs && p.lastSeq > q.lastSeq)
          acc((p.series, bucket)) = q.copy(
            sum = q.sum + p.sum,
            cnt = q.cnt + p.cnt,
            min = math.min(q.min, p.min),
            max = math.max(q.max, p.max),
            last = if (takeP) p.last else q.last,
            lastTs = if (takeP) p.lastTs else q.lastTs,
            lastSeq = if (takeP) p.lastSeq else q.lastSeq)
      }
    }
    acc.values.toSeq
  }

  /** Histogram observe into a cumulative-bucket ladder.
    * metric/mod.rs:53-61: count += 1, sum += f, every bucket with f <= upper += 1.
    * Out-of-ladder values count toward count/sum only (no +Inf bucket unless
    * the ladder carries one), matching the reference comment.
    */
  def histogram(values: Seq[Double], ladder: Array[Double]): (Long, Double, Array[Long]) = {
    val buckets = new Array[Long](ladder.length)
    var count = 0L
    var sum = 0.0
    values.foreach { v =>
      count += 1
      sum += v
      var i = 0
      while (i < ladder.length) {
        if (v <= ladder(i)) buckets(i) += 1
        i += 1
      }
    }
    (count, sum, buckets)
  }

  /** Pairwise histogram merge: element-wise bucket add (same ladder required).
    * The reference resets state on layout mismatch
    * (metricalize.rs:233-248); we mirror by requiring equal layouts.
    */
  def mergeHistogram(a: (Long, Double, Array[Long]), b: (Long, Double, Array[Long]))
      : (Long, Double, Array[Long]) = {
    require(a._3.length == b._3.length, "bucket layout mismatch")
    (a._1 + b._1, a._2 + b._2, a._3.zip(b._3).map { case (x, y) => x + y })
  }

  /** Absolute→delta/rate normalization per series
    * (sink/buffer/metrics.rs:99-141): first observation → None; later →
    * value - prev, with the Prometheus counter-reset rule (negative delta ⇒
    * the raw value is taken as the delta). Rate = delta / dt seconds.
    */
  def deltaRate(points: Seq[(Long, Double)]): Seq[(Long, Option[Double], Option[Double])] = {
    val sorted = points.sortBy(_._1)
    sorted.zipWithIndex.map { case ((ts, v), i) =>
      if (i == 0) (ts, None, None)
      else {
        val (pts, pv) = sorted(i - 1)
        val d = v - pv
        val delta = if (d < 0) v else d
        val dt = (ts - pts).toDouble
        (ts, Some(delta), if (dt > 0) Some(delta / dt) else None)
      }
    }
  }
}
