package graft.tools

import graft.sources.TokenFixture
import graft.tiers.TierCascade
import org.apache.spark.sql.SparkSession

/** Dev probe: the FULL bench cascade (3 concurrent chains, lake commits) at
  * one parallelism level with a chosen salt factor, bench-identical session.
  * One shot per JVM:
  *   sbt "Test/runMain graft.tools.CascProbe 8 1 [rawPath] [codec] [copart]"
  * The optional 4th arg sets spark.io.compression.codec (default lz4 — the
  * bench's shipped codec); the probe prints the populate wall and the shot's
  * shuffle-write bytes/time so a codec A/B prices its tmpfs-page savings
  * against its CPU cost. The optional 5th arg "copart" runs the
  * co-partitioned cascade (one shared series-hash exchange).
  */
object CascProbe {
  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
  }
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val salts = args(1).toInt
    val raw = if (args.length > 2) args(2) else "/tmp/graft_bench/raw_v2_n48000000"
    val codec = if (args.length > 3) args(3) else "lz4"
    val copart = args.length > 4 && args(4) == "copart"
    // A/B hook: "latepages" restores the pre-overlap schedule (fused agg
    // materialized before the pages chain is submitted)
    val pagesFirst = !args.contains("latepages")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"casc-probe-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.io.compression.codec", codec)
      // A/B hook: larger shuffle write buffers (fewer, larger tmpfs writes)
      // to price against the hi child's sh_w_sec stall
      .config("spark.shuffle.file.buffer",
        sys.env.getOrElse("SPARK_GRAFT_SHUF_BUF", "32k"))
      .config("spark.shuffle.unsafe.file.output.buffer",
        sys.env.getOrElse("SPARK_GRAFT_SHUF_BUF", "32k"))
      .config("spark.local.dir", {
        val d = "/dev/shm/graft-spark-local"; new java.io.File(d).mkdirs(); d
      })
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wNanos = new java.util.concurrent.atomic.AtomicLong
    val wBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          wNanos.addAndGet(m.shuffleWriteMetrics.writeTime)
          wBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    val obs = TokenFixture.deriveObs(spark.read.parquet(raw))
      .select("series", "ts", "seq", "value").persist()
    val p0 = System.nanoTime()
    val n = obs.count()
    val populateSec = (System.nanoTime() - p0) / 1e9
    // exact-code warmup, thin slice (mirrors the bench child)
    val warmBase = s"/dev/shm/casc-probe-warm-$cpus"
    deleteRec(new java.io.File(warmBase))
    TierCascade.run(spark, obs.limit(200000), warmBase, seriesBuckets = 8,
      salts = salts, withHistograms = true, withPages = true,
      copartition = copart, pagesFirst = pagesFirst)
    deleteRec(new java.io.File(warmBase))
    val base = s"/dev/shm/casc-probe-$cpus-$salts"
    deleteRec(new java.io.File(base))
    Thread.sleep(150)
    val (b0, n0) = (wBytes.get, wNanos.get)
    val t0 = System.nanoTime()
    TierCascade.run(spark, obs, base, seriesBuckets = 8, salts = salts,
      withHistograms = true, withPages = true, copartition = copart,
      pagesFirst = pagesFirst)
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(150)
    val shMb = (wBytes.get - b0) / 1048576.0
    val shSec = (wNanos.get - n0) / 1e9
    println(f"CASC_PROBE cpus=$cpus salts=$salts codec=$codec copart=$copart pagesFirst=$pagesFirst n=$n populate=$populateSec%.2f sec=$sec%.2f sh_w_mb=$shMb%.1f sh_w_sec=$shSec%.2f")
    deleteRec(new java.io.File(base))
    spark.stop()
  }
}
