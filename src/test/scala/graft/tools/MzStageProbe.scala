package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.TokenFixture
import graft.functions.Metricalize

/** Dev probe (round 6): per-STAGE wall of the CURRENT metricalize operator at
  * an arbitrary level, bench-child-identical session (AQE off, zstd, cpus×4
  * partitions), 1/3 sample — decomposes the mz scaling datapoint's hi-level
  * wall into scan/exchange/replay/tiny-frame shares so the non-scaling floor
  * is attributable to a specific stage.
  *
  *   MZ_PROBE_CPUS=4 sbt "test:runMain graft.tools.MzStageProbe"
  */
object MzStageProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("MZ_PROBE_CPUS", "4").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.local.dir", { val d = "/dev/shm/graft-spark-local"; new java.io.File(d).mkdirs(); d })
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Int, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for { s <- i.submissionTime; c <- i.completionTime } yield (c - s) / 1e3).getOrElse(-1.0)
        stages.add((i.stageId, wall, i.numTasks, i.name.takeWhile(_ != '\n').take(50)))
      }
    })
    val obs = TokenFixture.deriveObs(spark.read.parquet("/tmp/graft_bench/raw_v2_n48000000"))
      .filter(pmod(col("seq"), lit(3L)) === 0)
      .select(col("source"), col("value"), col("seq")).persist()
    val b = obs.agg(count(lit(1)), min(col("seq")), max(col("seq"))).head()
    println(s"rows=${b.getLong(0)} cpus=$cpus")
    val bounds = Some((b.getLong(1), b.getLong(2)))
    val specs = Seq(
      Metricalize.MetricSpec("toks", "counter", "col:value", tagPaths = Map("src" -> "col:source")),
      Metricalize.MetricSpec("toks", "gauge", "col:value", tagPaths = Map("src" -> "col:source")))
    def run() =
      Metricalize.metricalize(obs, "source", specs, col("seq"), numChunks = 64, ordBounds = bounds)
        .agg(sum(col("mismatches")), count(lit(1))).head()
    // exact-code warmup on a thin slice (the bench children's contract)
    Metricalize.metricalize(obs.filter(pmod(col("seq"), lit(499L)) === 0),
      "source", specs, col("seq"), numChunks = 64, ordBounds = bounds)
      .agg(sum(col("mismatches"))).head()
    stages.clear()
    val t0 = System.nanoTime()
    run()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(200)
    import scala.jdk.CollectionConverters._
    println(f"TOTAL wall $wall%.2f s")
    stages.asScala.toSeq.sortBy(_._1).foreach { case (id, w, t, n) =>
      println(f"  stage $id%4d $w%7.2f s tasks=$t%-4d $n")
    }
    spark.stop()
  }
}
