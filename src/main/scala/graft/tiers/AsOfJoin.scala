package graft.tiers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.4): for every left row, attach the latest right
  * row with rightTs <= leftTs within the same key — the temporal lookup the
  * north rule requires for gap-fill and enrichment. Spark has no native as-of
  * join; this composes built-ins via the union + ordered-window LOCF pattern.
  *
  * Scale design (round-2 rewrite): a window partitioned by the key alone
  * bounds parallelism by key cardinality — with 5 hot keys, one task sorts
  * 20% of the table (the round-1 scale-killer). Instead, time is split into
  * chunks and the LOCF window partitions by (key, chunk):
  *
  *   1. per (key, chunk): the build side's last row (tiny boundary frame,
  *      one row per key×chunk — aggregated map-side, not sorted)
  *   2. carry-in per (key, chunk) = LOCF of those boundary rows over the
  *      chunk sequence (window over the tiny frame only)
  *   3. carry-in rows are injected as synthetic build rows at each chunk
  *      start, then the usual union → per-(key, chunk) window → keep probes
  *
  * Parallelism is keys × chunks; each task sorts one chunk of one key. The
  * full-table shuffles are all hash-partitioned aggregations or the final
  * bounded window — no single-task global sort survives at any key skew.
  *
  * Determinism: two build rows tied on (key, ts) are ordered by `rightSeq`
  * when given (the (ts, seq) convention used across the tier layer), else by
  * the value columns themselves — either way last() is deterministic under
  * any partitioning.
  */
object AsOfJoin {

  /** @param left      probe side; must contain keyCols + leftTs
    * @param right     build side; must contain keyCols + rightTs + value cols
    * @param keyCols   equality keys
    * @param leftTs    probe event-time column name (long/timestamp, orderable)
    * @param rightTs   build event-time column name
    * @param valueCols right columns to carry onto the output; must not
    *                  collide with existing left column names (rejected —
    *                  silently nulling probe data was a round-1 defect)
    * @param numChunks target time-chunk count (the key×chunk parallelism
    *                  knob); chunk width is derived from the observed ts span
    * @param rightSeq  optional build-side unique tiebreak column for rows
    *                  tied on (key, ts)
    * @param tsBounds  optional caller-supplied [lo, hi] of the long-form ts
    *                  domain (µs for timestamp columns): skips the blocking
    *                  min/max reduce — worth it when the caller already knows
    *                  the window (e.g. a partition-pruned day) and issues
    *                  many as-of joins. Rows outside the bounds are clamped
    *                  into the first/last chunk (correctness preserved;
    *                  parallelism of the clamped tail degrades).
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      numChunks: Int = 64,
      rightSeq: Option[String] = None,
      tsBounds: Option[(Long, Long)] = None): DataFrame = {
    val collisions = valueCols.intersect(left.columns.toSeq)
    require(collisions.isEmpty,
      s"valueCols ${collisions.mkString(",")} collide with probe-side columns — rename one side")
    require(numChunks >= 1, "numChunks must be >= 1")

    val leftCarry = left.columns.filterNot(keyCols.contains).toSeq
    val tieCol = rightSeq.map(col).getOrElse(struct(valueCols.map(col): _*))

    // order-preserving long form of an event time (µs for timestamps;
    // TIMESTAMP_NTZ has no direct long cast)
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    def toLong(df: DataFrame, tsName: String): Column = df.schema(tsName).dataType match {
      case TimestampNTZType => unix_micros(col(tsName).cast("timestamp"))
      case TimestampType => unix_micros(col(tsName))
      case _ => col(tsName).cast("long")
    }

    // _side: carry-in -1 < build 0 < probe 1, so at equal ts a probe sees the
    // build row (<= semantics) and a real build row beats an injected carry
    val probe = left
      .withColumn("_t", toLong(left, leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast(right.select(tieCol).schema.head.dataType))
      .withColumns(valueCols.map(v => v -> lit(null).cast(right.schema(v).dataType)).toMap)
      .select((keyCols.map(col) :+ col("_t") :+ col("_side") :+ col("_tie")) ++
        valueCols.map(col) ++ leftCarry.map(c => col(c).as(s"_l_$c")): _*)
    val build = right
      .withColumn("_t", toLong(right, rightTs))
      .withColumn("_side", lit(0))
      .withColumn("_tie", tieCol)
      .select((keyCols.map(col) :+ col("_t") :+ col("_side") :+ col("_tie")) ++
        valueCols.map(col): _*)
      .withColumns(leftCarry.map(c => s"_l_$c" ->
        lit(null).cast(left.schema(c).dataType)).toMap)

    val unioned = probe.unionByName(build)

    // chunk width from the observed span: one tiny reduce (map-side partial
    // agg to a single row) — the analog of AQE collecting stats pre-plan —
    // unless the caller supplied the bounds
    val Array(lo, hi) = tsBounds match {
      case Some((l, h)) => require(h >= l, s"tsBounds [$l, $h] inverted"); Array(l, h)
      case None =>
        val r = unioned.agg(min(col("_t")), max(col("_t"))).head()
        if (r.isNullAt(0)) Array(0L, 0L) else Array(r.getLong(0), r.getLong(1))
    }
    val chunkW = math.max(1L, (hi - lo) / numChunks + 1)
    // the clamp (out-of-bounds rows land in the first/last chunk) must not
    // swallow nulls: least/greatest skip null inputs, so an un-guarded clamp
    // would send a null-ts row into the LAST chunk (joining the latest build
    // value) instead of keeping its null chunk → null as-of value
    val chunked = unioned.withColumn("_chunk",
      when(col("_t").isNotNull,
        greatest(lit(0L), least(lit((hi - lo) / chunkW),
          floor((col("_t") - lo) / chunkW).cast("long")))))

    // boundary: per (key, chunk) the build side's last (values, tie) — then
    // carry-in for chunk c = the latest boundary from any chunk < c. The
    // chunk spine is GENERATED from the build-key set (first build chunk →
    // last chunk) rather than distinct-scanning the data: only keys with
    // build rows can carry, and the chunk universe is known, so no
    // data-sized pass is spent discovering (key, chunk) combinations.
    val valStruct = struct(valueCols.map(col): _*)
    val perChunkLast = chunked
      .filter(col("_side") === 0)
      .groupBy((keyCols.map(col) :+ col("_chunk")): _*)
      .agg(max_by(valStruct, struct(col("_t"), col("_tie"))).as("_last"))
    val maxChunk = (hi - lo) / chunkW
    val chunkSpine = perChunkLast
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("_chunk")).as("_c0"))
      .select((keyCols.map(col) :+
        explode(sequence(col("_c0"), lit(maxChunk))).as("_chunk")): _*)
    val carryW = Window.partitionBy(keyCols.map(col): _*).orderBy(col("_chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = chunkSpine
      .join(perChunkLast, keyCols :+ "_chunk", "left")
      .withColumn("_carry", last(col("_last"), ignoreNulls = true).over(carryW))
      .filter(col("_carry").isNotNull)
      .select((keyCols.map(col) :+ col("_chunk") :+
        (lit(lo) + col("_chunk") * chunkW).as("_t") :+ lit(-1).as("_side") :+
        lit(null).cast(right.select(tieCol).schema.head.dataType).as("_tie")) ++
        valueCols.map(v => col(s"_carry.$v").as(v)) ++
        leftCarry.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")): _*)

    val w = Window.partitionBy((keyCols.map(col) :+ col("_chunk")): _*)
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(chunked.unionByName(carries)) { (df, v) =>
      df.withColumn(v, last(when(col("_side") <= 0, col(v)), ignoreNulls = true).over(w))
    }
    filled
      .filter(col("_side") === 1)
      .select(keyCols.map(col) ++
        leftCarry.map(c => col(s"_l_$c").as(c)) ++
        valueCols.map(col): _*)
  }

  /** Broadcast as-of join — the plan to pick when the build side is
    * dimension/snapshot-shaped (bounded rows, like Spark's own
    * autoBroadcastJoinThreshold reasoning): the build rows are collected per
    * key into ts-sorted arrays, broadcast once, and every probe row does one
    * O(log n) binary search inside a codegen'd UDF call. The probe side is
    * never shuffled and never sorted — a narrow map that scales with
    * executors with no barrier, which the chunked [[asof]] (one hash shuffle
    * + per-(key, chunk) sort of probe ∪ build) cannot match when the build is
    * small. Semantics are identical to [[asof]]: latest build row with
    * build_ts <= probe_ts per key, ties on (ts) broken by `rightSeq` when
    * given else by the value columns.
    *
    * Value columns must be atomic types (long/int/double/float/string/
    * boolean) — each gets its own typed lookup UDF sharing the broadcast
    * index. Use [[asof]] for timestamp/struct/array values or unbounded
    * build sides ([[asofAuto]] dispatches the same way, on a build-side
    * row count plus this type check).
    */
  def asofBroadcast(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      rightSeq: Option[String] = None): DataFrame = {
    val collisions = valueCols.intersect(left.columns.toSeq)
    require(collisions.isEmpty,
      s"valueCols ${collisions.mkString(",")} collide with probe-side columns — rename one side")
    import org.apache.spark.sql.types._
    def toLong(df: DataFrame, tsName: String): Column = df.schema(tsName).dataType match {
      case TimestampNTZType => unix_micros(col(tsName).cast("timestamp"))
      case TimestampType => unix_micros(col(tsName))
      case _ => col(tsName).cast("long")
    }
    // deterministic build order (t, tie): the as-of pick at probe time T is
    // the LAST row with t <= T in this order — max tie among tied ts, the
    // same row the chunked window's last() selects
    val tieCol = rightSeq.map(col).getOrElse(struct(valueCols.map(col): _*))
    val buildRows = right
      .select(struct(keyCols.map(col): _*).as("_k"), toLong(right, rightTs).as("_t"),
        tieCol.as("_tie"), struct(valueCols.map(col): _*).as("_v"))
      .filter(col("_t").isNotNull)
      .collect() // unsorted: the index groups and orders driver-side anyway
    // per key: ts array sorted by (t, tie) + parallel value rows
    // tie comparator mirroring the chunked path's orderBy(_tie): numeric seq
    // compares numerically; a value-struct tie compares field-by-field
    def cmpAny(a: Any, b: Any): Int = (a, b) match {
      case (null, null) => 0
      case (null, _) => -1 // nulls-first, Spark's default sort order
      case (_, null) => 1
      case (x: Long, y: Long) => java.lang.Long.compare(x, y)
      case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
      case (x: Double, y: Double) => java.lang.Double.compare(x, y)
      case (x: Float, y: Float) => java.lang.Float.compare(x, y)
      case (x: String, y: String) => x.compareTo(y)
      case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
      case (x: org.apache.spark.sql.Row, y: org.apache.spark.sql.Row) =>
        x.toSeq.zip(y.toSeq).iterator.map { case (u, v) => cmpAny(u, v) }
          .find(_ != 0).getOrElse(0)
      case (x, y) => x.toString.compareTo(y.toString) // stable fallback
    }
    val rowOrd: Ordering[org.apache.spark.sql.Row] =
      (r1, r2) => {
        val c = java.lang.Long.compare(r1.getLong(1), r2.getLong(1))
        if (c != 0) c else cmpAny(r1.get(2), r2.get(2))
      }
    val index: Map[Seq[Any], (Array[Long], Array[org.apache.spark.sql.Row])] =
      buildRows.groupBy(_.getStruct(0).toSeq).map { case (k, rows) =>
        val sorted = rows.sorted(rowOrd)
        (k, (sorted.map(_.getLong(1)), sorted.map(_.getStruct(3))))
      }
    val bc = left.sparkSession.sparkContext.broadcast(index)
    // last index with ts[i] <= t, else -1
    def search(ts: Array[Long], t: Long): Int = {
      var l = 0; var r = ts.length - 1; var found = -1
      while (l <= r) {
        val m = (l + r) >>> 1
        if (ts(m) <= t) { found = m; l = m + 1 } else r = m - 1
      }
      found
    }
    def lookupFor(vi: Int, dt: DataType): (Column, Column) => Column = {
      def pick(k: org.apache.spark.sql.Row, t: java.lang.Long): Any = {
        if (t == null) null
        else bc.value.get(k.toSeq) match {
          case None => null
          case Some((ts, vs)) =>
            val i = search(ts, t)
            if (i < 0) null else vs(i).get(vi)
        }
      }
      val u = dt match {
        case DoubleType => udf { (k: org.apache.spark.sql.Row, t: java.lang.Long) =>
          pick(k, t).asInstanceOf[java.lang.Double] }
        case FloatType => udf { (k: org.apache.spark.sql.Row, t: java.lang.Long) =>
          pick(k, t).asInstanceOf[java.lang.Float] }
        case LongType => udf { (k: org.apache.spark.sql.Row, t: java.lang.Long) =>
          pick(k, t).asInstanceOf[java.lang.Long] }
        case IntegerType => udf { (k: org.apache.spark.sql.Row, t: java.lang.Long) =>
          pick(k, t).asInstanceOf[java.lang.Integer] }
        case StringType => udf { (k: org.apache.spark.sql.Row, t: java.lang.Long) =>
          pick(k, t).asInstanceOf[String] }
        case BooleanType => udf { (k: org.apache.spark.sql.Row, t: java.lang.Long) =>
          pick(k, t).asInstanceOf[java.lang.Boolean] }
        case other => throw new IllegalArgumentException(
          s"asofBroadcast supports atomic value columns only, got $other — use asof()")
      }
      (k, t) => u(k, t)
    }
    val kCol = struct(keyCols.map(col): _*)
    val tCol = toLong(left, leftTs)
    valueCols.zipWithIndex.foldLeft(left) { case (df, (v, vi)) =>
      df.withColumn(v, lookupFor(vi, right.schema(v).dataType)(kCol, tCol))
    }
  }

  /** Dispatch between [[asofBroadcast]] and chunked [[asof]] on the observed
    * build-side row count (one agg on the build side only — the analog of
    * Spark's broadcast-threshold stats check). `broadcastRowLimit` bounds the
    * driver-collected index; beyond it the shuffle-based chunked plan is the
    * only shape that scales.
    */
  def asofAuto(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      numChunks: Int = 64,
      rightSeq: Option[String] = None,
      tsBounds: Option[(Long, Long)] = None,
      broadcastRowLimit: Long = 2000000L): DataFrame = {
    val n = right.count()
    val atomic = {
      import org.apache.spark.sql.types._
      valueCols.forall(v => right.schema(v).dataType match {
        case DoubleType | FloatType | LongType | IntegerType | StringType | BooleanType => true
        case _ => false
      })
    }
    if (n <= broadcastRowLimit && atomic)
      asofBroadcast(left, right, keyCols, leftTs, rightTs, valueCols, rightSeq)
    else asof(left, right, keyCols, leftTs, rightTs, valueCols, numChunks, rightSeq, tsBounds)
  }
}
