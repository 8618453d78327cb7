package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: paired-level scaling of the two sequential-replay operators —
  * GCRA throttle (ops/Throttle.gcraAdmit) and LRU dedup
  * (ops/DedupFields.dedupLru, sharded) — at HIGH key cardinality, where the
  * hash-shuffle replay's parallelism comes from. One JVM per level (bench
  * methodology — sequential sessions in one JVM degrade):
  *   sbt "Test/runMain graft.ReplayProbe 2"   # lo
  *   sbt "Test/runMain graft.ReplayProbe 8"   # hi
  * Input: ~24M events over 100k keys, parquet-cached under /tmp/graft_bench.
  */
object ReplayProbe {
  def main(args: Array[String]): Unit = {
    // machine-read JSON: pin the locale so %.2f never emits comma decimals
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = args.headOption.map(_.toInt).getOrElse(8)
    val nEv = if (args.length > 1) args(1).toLong else 24000000L
    val nKeys = 100000L
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // AQE off in scaling children (bench protocol: fixed stage shapes)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.local.dir", "/dev/shm/replay_probe_local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val path = s"/tmp/graft_bench/replayev_n$nEv"
    // gate on _SUCCESS, not the bare dir (same rule as Bench.ensureRaw): a
    // probe killed mid-write must not leave a torn fixture that the next
    // invocation silently benchmarks against
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      spark.range(nEv).select(
          col("id").as("seq"),
          concat(lit("k"), pmod(xxhash64(col("id")), lit(nKeys))).as("key"),
          // bursty per-key arrivals: ~60% of events land within the burst
          (col("id") * 37L % 86400000000L).as("t_us"),
          pmod(col("id"), lit(4096L)).cast("string").as("payload"))
        .write.mode("overwrite").parquet(path)
    }

    val ev = spark.read.parquet(path).persist()
    val n = ev.count() // untimed cache populate
    // exact-code warmup on a thin slice (JIT + codegen)
    graft.ops.Throttle.gcraAdmit(ev.filter(pmod(col("seq"), lit(499L)) === 0),
        Seq("key"), col("t_us"), col("seq"), threshold = 4,
        windowMicros = 60000000L)
      .agg(sum(when(col("admitted"), 1L).otherwise(0L))).head()

    val t0 = System.nanoTime()
    val adm = graft.ops.Throttle.gcraAdmit(ev, Seq("key"), col("t_us"),
        col("seq"), threshold = 4, windowMicros = 60000000L)
      .agg(sum(when(col("admitted"), 1L).otherwise(0L))).head().getLong(0)
    val gcraSec = (System.nanoTime() - t0) / 1e9

    graft.ops.DedupFields.dedupLru(
        ev.filter(pmod(col("seq"), lit(499L)) === 0),
        Seq("key", "payload"), "t_us", "seq", cacheSize = 4096, shards = 32)
      .agg(count(lit(1))).head()
    val t1 = System.nanoTime()
    val kept = graft.ops.DedupFields.dedupLru(ev, Seq("key", "payload"),
        "t_us", "seq", cacheSize = 4096, shards = 32)
      .agg(count(lit(1))).head().getLong(0)
    val lruSec = (System.nanoTime() - t1) / 1e9

    println(f"""REPLAY_PROBE {"cpus":$cpus,"n_events":$n,"n_keys":$nKeys,"gcra_sec":$gcraSec%.2f,"gcra_admitted":$adm,"gcra_ev_per_sec":${(n / gcraSec).toLong},"lru_sec":$lruSec%.2f,"lru_kept":$kept,"lru_ev_per_sec":${(n / lruSec).toLong}}""")
    spark.stop()
  }
}
