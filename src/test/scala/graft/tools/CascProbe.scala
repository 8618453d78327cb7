package graft.tools

import graft.sources.TokenFixture
import graft.tiers.TierCascade
import org.apache.spark.sql.SparkSession

/** Dev probe: the FULL bench cascade (3 concurrent chains, lake commits) at
  * one parallelism level with a chosen salt factor, bench-identical session.
  * One shot per JVM:
  *   sbt "Test/runMain graft.tools.CascProbe 8 1"
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
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"casc-probe-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.local.dir", {
        val d = "/dev/shm/graft-spark-local"; new java.io.File(d).mkdirs(); d
      })
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val obs = TokenFixture.deriveObs(spark.read.parquet(raw))
      .select("series", "ts", "seq", "value").persist()
    val n = obs.count()
    // exact-code warmup, thin slice (mirrors the bench child)
    val warmBase = s"/dev/shm/casc-probe-warm-$cpus"
    deleteRec(new java.io.File(warmBase))
    TierCascade.run(spark, obs.limit(200000), warmBase, seriesBuckets = 8,
      salts = salts, withHistograms = true, withPages = true)
    deleteRec(new java.io.File(warmBase))
    val base = s"/dev/shm/casc-probe-$cpus-$salts"
    deleteRec(new java.io.File(base))
    val t0 = System.nanoTime()
    TierCascade.run(spark, obs, base, seriesBuckets = 8, salts = salts,
      withHistograms = true, withPages = true)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"CASC_PROBE cpus=$cpus salts=$salts n=$n sec=$sec%.2f")
    deleteRec(new java.io.File(base))
    spark.stop()
  }
}
