package graft.tools

import graft.lake.LakeTable
import graft.sources.TokenFixture
import graft.tiers.{TierCascade, TierRollup}
import org.apache.spark.sql.SparkSession

/** Dev probe: the cascade's critical-path stage (raw->1m rollup + lake
  * append) in isolation, bench-identical session config, to attribute the
  * stage's 2→8 scaling gap to salting vs the rest. One (cpus, salts) shot
  * per JVM:
  *   sbt "Test/runMain graft.tools.SaltProbe 8 4"
  */
object SaltProbe {
  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
  }
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val salts = args(1).toInt
    val raw = if (args.length > 2) args(2) else "/tmp/graft_bench/raw_v2_n48000000"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"salt-probe-$cpus")
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
    val n = obs.count() // untimed populate
    val base = s"/dev/shm/salt-probe-$cpus-$salts"
    deleteRec(new java.io.File(base))
    // exact-code warmup on a thin slice
    val warmLake = new LakeTable(spark, base, "warm_1m", "pk")
    val warmIn = if (salts > 1) TierRollup.fromObsSalted(obs.limit(200000), 60L, salts)
                 else TierRollup.fromObs(obs.limit(200000), 60L)
    warmLake.append(warmIn.withColumn("pk", TierCascade.partKey(8)), "warm")
    val t0 = System.nanoTime()
    val t1m = if (salts > 1) TierRollup.fromObsSalted(obs, 60L, salts)
              else TierRollup.fromObs(obs, 60L)
    val lake = new LakeTable(spark, base, "tier_1m", "pk")
    lake.append(t1m.withColumn("pk", TierCascade.partKey(8)), "probe")
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"SALT_PROBE cpus=$cpus salts=$salts n=$n sec=$sec%.2f")
    deleteRec(new java.io.File(base))
    spark.stop()
  }
}
