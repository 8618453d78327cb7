package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BooleanType

/** GCRA (generic cell rate algorithm) throttle — the reference's actual
  * admission semantics (/root/reference/src/transforms/throttle/mod.rs:84-174,
  * rate_limiter.rs check_and_modify via the gcra crate): per key, a
  * theoretical-arrival-time (TAT) state admits up to `threshold` events as a
  * burst, then one per `window/threshold` steadily; DENIED events do NOT
  * advance the state. The q10-style row_number throttle is the deterministic
  * per-window analog; this operator replays the token bucket itself.
  *
  * Batch form: events are replayed per key in (t, seq) order. All math is
  * exact BIGINT microseconds (emission interval τ = windowMicros/threshold,
  * floor), so the replay is bit-reproducible across engines — the DuckDB
  * oracle recomputes it with a recursive CTE over the same integers.
  *
  * Per event at time t (µs):
  *   tat0    = max(tat, t)          — an idle key's debt never predates now
  *   newTat  = tat0 + τ
  *   admit  ⇔ newTat − window ≤ t   — i.e. the burst allowance still covers it
  *   on admit: tat = newTat; on deny: tat unchanged (GCRA, not leaky bucket)
  *
  * The reference's `retain_recent` flush (rate_limiter.rs:50-58) drops states
  * with tat ≤ now — semantically a no-op (such a state behaves exactly like a
  * fresh one), so the batch replay needs no analog.
  *
  * Scale shape: one hash shuffle on the key columns + a per-partition
  * streaming replay over consecutive key runs (the Pages.pagesFromObs
  * pattern) — no window function, no driver state. Parallelism is bounded by
  * key cardinality: GCRA admission is INHERENTLY sequential per key (denied
  * events leave no trace, so chunk results cannot be merged algebraically the
  * way metricalize's kind-replay can). Throttle keys are per-tenant/user
  * templates in practice — high cardinality — and the reference processes
  * the whole stream on one thread; a single globally-hot key is serial in any
  * faithful implementation.
  */
object Throttle {

  /** Append an `admitted` boolean to `df` by GCRA replay.
    *
    * @param keyCols      throttle key (the reference's rendered key_field);
    *                     empty = one global limiter
    * @param tMicros      event time in µs (long; null times are denied and
    *                     leave the state untouched)
    * @param seqCol       unique tie-break for equal times (replay total order)
    * @param threshold    burst size (reference `threshold`)
    * @param windowMicros refill window in µs (reference `window`)
    */
  def gcraAdmit(df: DataFrame, keyCols: Seq[String], tMicros: Column, seqCol: Column,
      threshold: Int, windowMicros: Long): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    require(windowMicros >= threshold, s"window $windowMicros µs too small for threshold $threshold")
    val tau = windowMicros / threshold
    val work = df.withColumn("_t", tMicros.cast("long")).withColumn("_seq", seqCol)
    val parted =
      (if (keyCols.isEmpty) work.repartition(1) else work.repartition(keyCols.map(col): _*))
        .sortWithinPartitions((keyCols.map(col) :+ col("_t") :+ col("_seq")): _*)
    val schema = parted.schema.add("admitted", BooleanType, nullable = false)
    val ki = keyCols.map(parted.schema.fieldIndex).toArray
    val ti = parted.schema.fieldIndex("_t")
    val width = schema.length
    val kn = ki.length
    val replayed = parted.mapPartitions { it =>
      // rows arrive key-sorted, so keys change once per run: the current key
      // is held in a reused Array and compared IN PLACE — no per-row Seq
      // alloc, copies only at run boundaries. Output rows are built through
      // one fresh Array wrapped without copy (unsafeWrapArray) instead of
      // the old toSeq + :+ + fromSeq triple copy: at 10⁹ events per shard
      // the replay loop's garbage is what bounds throughput, not the math.
      val curKey = new Array[Any](kn)
      var haveKey = false
      var tat = Long.MinValue
      def sameKey(r: Row): Boolean = {
        var i = 0
        while (i < kn) {
          // ReplayKeys.eq, not Object.equals: the shuffle groups ±0.0 (and
          // all NaNs) as ONE key, so the replay must too — a plain equals
          // would reset the GCRA state mid-run on a -0.0/0.0 flip
          if (!ReplayKeys.eq(curKey(i), r.get(ki(i)))) return false
          i += 1
        }
        true
      }
      it.map { r =>
        if (!haveKey || !sameKey(r)) {
          var i = 0
          while (i < kn) { curKey(i) = r.get(ki(i)); i += 1 }
          haveKey = true
          tat = Long.MinValue
        }
        val admitted =
          if (r.isNullAt(ti)) false
          else {
            val t = r.getLong(ti)
            val tat0 = if (tat == Long.MinValue) t else math.max(tat, t)
            val newTat = tat0 + tau
            val ok = newTat - windowMicros <= t
            if (ok) tat = newTat
            ok
          }
        val out = new Array[Any](width)
        var i = 0
        while (i < width - 1) { out(i) = r.get(i); i += 1 }
        out(width - 1) = admitted
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
      }
    }(Encoders.row(schema))
    replayed.drop("_t", "_seq")
  }
}
