package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup transform field modes (/root/reference/src/transforms/dedup.rs:18-51):
  * `Match` keys on the listed fields, `Ignore` keys on their COMPLEMENT —
  * every column except the listed ones (the reference caches type+name+value
  * of all non-ignored fields, dedup.rs:101-120). First occurrence passes.
  *
  * Batch form: deterministic first-by-(ts, seq) per key via min_by, one
  * hash-shuffle on the key columns (the streaming form is
  * StreamRollup.dedupStream, state bounded by the watermark).
  */
object DedupFields {

  /** First occurrence per explicit key list (Match mode). */
  def dedupMatch(df: DataFrame, fields: Seq[String], tsCol: String, seqCol: String): DataFrame =
    firstPerKey(df, fields, tsCol, seqCol)

  /** First occurrence keyed on every column EXCEPT `ignore` (Ignore mode);
    * ts/seq order columns are excluded from the key automatically.
    */
  def dedupIgnore(df: DataFrame, ignore: Seq[String], tsCol: String, seqCol: String): DataFrame = {
    val keys = df.columns.filterNot(c =>
      ignore.contains(c) || c == tsCol || c == seqCol).toSeq
    require(keys.nonEmpty, "Ignore mode removed every key column")
    firstPerKey(df, keys, tsCol, seqCol)
  }

  private def firstPerKey(df: DataFrame, keys: Seq[String], tsCol: String,
      seqCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol), col(seqCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Bounded-recency (LRU) dedup — the reference's ACTUAL cache semantics
    * (/root/reference/src/transforms/dedup.rs:54-56,175-191: a default
    * 4096-entry `LruCache`; an event passes iff `cache.put(entry)` finds no
    * existing key, and BOTH hits and inserts refresh the entry's recency, so
    * a key seen again after eviction RE-ADMITS — unlike the global
    * first-occurrence modes above, which model an unbounded cache).
    *
    * Batch replay: events stream through a per-shard LRU in (ts, seq) order.
    * With the default single shard the replay is bit-faithful to the
    * reference's sequential transform (one task — the reference itself is one
    * thread with one shared cache). `shards > 1` is the scale mode: events
    * hash-partition by key, each shard runs its own `cacheSize` LRU — every
    * within-key duplicate still lands in the same shard, so dedup decisions
    * differ from the sequential replay only through cross-key eviction
    * pressure (documented divergence; the reference's eviction order is
    * global arrival order, which no parallel replay can reproduce).
    */
  def dedupLru(df: DataFrame, keys: Seq[String], tsCol: String, seqCol: String,
      cacheSize: Int, shards: Int = 1): DataFrame = {
    require(cacheSize > 0, "cacheSize must be positive")
    require(shards >= 1, "shards must be >= 1")
    import org.apache.spark.sql.{Encoders, Row}
    val work =
      if (shards == 1) df.repartition(1)
      else df.repartition(shards, keys.map(col): _*)
    val parted = work.sortWithinPartitions(col(tsCol), col(seqCol))
    val ki = keys.map(parted.schema.fieldIndex).toArray
    val schema = parted.schema
    val kn = ki.length
    parted.mapPartitions { it =>
      val lru = new java.util.LinkedHashMap[ReplayKeys.GroupKey, java.lang.Boolean](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[ReplayKeys.GroupKey, java.lang.Boolean]): Boolean = size() > cacheSize
      }
      // reused PROBE key: a GroupKey wrapping a mutable array — element-wise
      // equals/hashCode with Spark's key-grouping semantics for floats
      // (±0.0 one key, NaN one key; ArraySeq's cooperative == would make
      // NaN keys never match, so they would never dedup), zero copy. put()
      // on a HIT keeps the map's existing key object and only refreshes
      // recency, so the probe stays reusable; only a MISS stores the probe,
      // and only then is a fresh array allocated — duplicate-heavy streams
      // (the operator's whole point) run the loop allocation-free.
      var probeArr = new Array[Any](kn)
      var probe = new ReplayKeys.GroupKey(probeArr)
      it.filter { r =>
        var i = 0
        while (i < kn) { probeArr(i) = r.get(ki(i)); i += 1 }
        val miss = lru.put(probe, java.lang.Boolean.TRUE) == null
        if (miss) { // probe now owned by the map: next row needs its own
          probeArr = new Array[Any](kn)
          probe = new ReplayKeys.GroupKey(probeArr)
        }
        miss // put refreshes recency on hit, like LruCache::put
      }
    }(Encoders.row(schema))
  }
}
