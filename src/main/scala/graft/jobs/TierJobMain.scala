package graft.jobs

import graft.sources.TokenFixture
import graft.tiers.TierCascade
import org.apache.spark.sql.SparkSession

/** spark-submit entrypoint for the tier cascade (north_rule: "jobs run via
  * spark-submit ... resumable from the last committed checkpoint").
  *
  *   spark-submit --class graft.jobs.TierJobMain vertexspark.jar \
  *     <rawTokenTableDir> <lakeBase> [seriesBuckets=8] [salts=4] [retention1m=...s]
  *
  * Reads the token table (input_hint shape), derives observations, runs the
  * resumable raw→1m→1h→1d cascade, optionally applies per-tier retention,
  * and prints a run report (per-tier new partitions + manifest counts).
  * Re-submitting after a failure recomputes only uncommitted partitions.
  *
  * No master/config is hard-coded here: spark-submit supplies the cluster
  * (the local[] defaults below only apply when launched outside submit).
  */
object TierJobMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TierJobMain <rawDir> <lakeBase> [seriesBuckets] [salts] [ttl1m] [ttl1h] [ttl1d]")
    val rawDir = args(0)
    val lakeBase = args(1)
    val seriesBuckets = if (args.length > 2) args(2).toInt else 8
    val salts = if (args.length > 3) args(3).toInt else 4
    val ttls: Map[String, Long] = Seq("1m", "1h", "1d").zipWithIndex.flatMap {
      case (t, i) => if (args.length > 4 + i) Some(t -> args(4 + i).toLong) else None
    }.toMap

    val builder = SparkSession.builder()
      .appName("graft-tier-cascade")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit supplies the master; fall back to local[] when launched directly
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val obs = TokenFixture.deriveObs(spark.read.parquet(rawDir))
      .select("series", "ts", "seq", "value")
    val results = TierCascade.run(spark, obs, lakeBase, seriesBuckets, salts)
    results.foreach { r =>
      println(s"[tier ${r.name}] new=${r.newPartitions.size} " +
        s"committed=${r.table.committedPartitions().size}")
    }
    if (ttls.nonEmpty) {
      val dropped = TierCascade.retention(results, ttls)
      dropped.foreach { case (t, ps) => println(s"[retention $t] expired=${ps.size}") }
    }
    spark.stop()
  }
}
