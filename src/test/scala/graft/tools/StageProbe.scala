package graft
import graft.sources.TokenFixture
import graft.tiers.{TierCascade, TierRollup}
import graft.functions.Pages
import org.apache.spark.sql.SparkSession
import java.nio.file.Files

/** Dev probe: per-stage wall time of the cascade at two parallelism levels. */
object StageProbe {
  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec); f.delete()
  }
  def main(args: Array[String]): Unit = {
    Seq(8, 32).foreach { cpus =>
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val obs = TokenFixture.deriveObs(spark.read.parquet("/tmp/graft_bench/raw_v2_n16000000"))
        .select("series", "ts", "seq", "value")
      // warmup
      obs.limit(100000).groupBy("series").count().count()
      def time(tag: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"[$cpus] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      val base = Files.createTempDirectory("probe_lake").toString
      time("core cascade (1m/1h/1d lake)") {
        TierCascade.run(spark, obs, base, seriesBuckets = 8, salts = 4)
      }
      time("hist_1m agg only (noop)") {
        TierRollup.histogramFromObs(obs, graft.model.Schemas.bucketLadder, 60L)
          .write.mode("overwrite").format("noop").save()
      }
      time("hist tiers (lake)") {
        val lake = new graft.lake.LakeTable(spark, base, "hist_1m", "pk")
        lake.append(TierRollup.histogramFromObs(obs, graft.model.Schemas.bucketLadder, 60L)
          .withColumn("pk", TierCascade.partKey(8)), "probe")
      }
      time("pages agg only (noop)") {
        Pages.pagesFromObs(obs, 3600L).write.mode("overwrite").format("noop").save()
      }
      time("pages (lake)") {
        val lake = new graft.lake.LakeTable(spark, base, "pages_1h", "pk")
        lake.append(Pages.pagesFromObs(obs, 3600L)
          .withColumn("pk", TierCascade.partKey(8)), "probe")
      }
      deleteRec(new java.io.File(base))
      spark.stop()
    }
  }
}
