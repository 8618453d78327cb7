package graft
import graft.sources.TokenFixture
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe: cost of the max_by(struct) SortAggregate vs plain hash agg. */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val obs = TokenFixture.deriveObs(spark.read.parquet(sys.env.getOrElse("AGG_PROBE_RAW", "/tmp/graft_bench/raw_v2_n16000000")))
      .select("series", "ts", "seq", "value")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s ($n cells)")
    }
    // warmup
    obs.groupBy("series").count().count()
    (1 to sys.env.getOrElse("AGG_PROBE_ROUNDS", "2").toInt).foreach { round =>
    println(s"--- round $round ---")
    time("hash-only (sum/count/min/max)") {
      obs.groupBy(col("series"), (floor(col("ts")/60)*60).cast("long").as("bucket"))
        .agg(sum("value"), count(lit(1)), min("value"), max("value")).count()
    }
    time("with max_by struct (SortAggregate)") {
      graft.tiers.TierRollup.fromObs(obs, 60L).count()
    }
    time("hash agg + packed-long last (ts*2^24+seq)") {
      obs.groupBy(col("series"), (floor(col("ts")/60)*60).cast("long").as("bucket"))
        .agg(sum("value"), count(lit(1)), min("value"), max("value"),
          max(col("ts") * 16777216L + pmod(col("seq"), lit(16777216L))).as("ord")).count()
    }
    }
    spark.stop()
  }
}
