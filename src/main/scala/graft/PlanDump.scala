package graft

import graft.sources.TokenFixture
import graft.tiers.TierRollup
import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the hot paths so scan pruning,
  * pushdown, partial aggregation and codegen spans can be inspected (builder
  * prompt: ".explain('formatted') the plan and iterate").
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("==== rollup 1m over parquet raw (column pruning check) ====")
    val raw = "/tmp/graft_bench/raw_n2000000"
    if (new java.io.File(raw).exists()) {
      val obs = TokenFixture.deriveObs(spark.read.parquet(raw))
        .select("series", "ts", "seq", "value")
      TierRollup.fromObs(obs, 60L).explain("formatted")
      println("==== salted variant ====")
      TierRollup.fromObsSalted(obs, 60L, 4).explain("formatted")
    }

    println("==== events rollup 1m (filter/pushdown check) ====")
    queries.EventQueries.rollup1m(spark, "/root/testdata/sf0.01").explain("formatted")

    println("==== gap-fill ====")
    queries.EventQueries.gapfillLocf(spark, "/root/testdata/sf0.01").explain("formatted")

    println("==== q39 metricalize (chunked kind-replay) ====")
    queries.TagQueries.metricalizePaths(spark, "/root/testdata/sf0.01").explain("formatted")

    println("==== q47 cardinality DropTag ====")
    queries.MoreQueries.cardinalityDropTag(spark, "/root/testdata/sf0.01").explain("formatted")

    println("==== q48 geoip range ====")
    queries.MoreQueries.geoipRange(spark, "/root/testdata/sf0.01").explain("formatted")

    println("==== q50 set ops ====")
    queries.MoreQueries.setOpsDiff(spark, "/root/testdata/sf0.01").explain("formatted")

    println("==== q32 multimodal decode ====")
    queries.MoreQueries.multimodalDecode(spark, "/root/testdata/sf0.01").explain("formatted")

    println("==== bench as-of shape (probe-carry pruning check) ====")
    locally {
      import org.apache.spark.sql.functions._
      val obs = queries.EventQueries.obs(spark, "/root/testdata/sf0.01")
        .select(col("series").as("source"), col("ts"), col("seq"), col("value"))
      val probe = obs.drop("value")
      val build = obs.filter(pmod(col("seq"), lit(997L)) === 0)
        .withColumnRenamed("value", "asof_v")
      tiers.AsOfJoin.asof(probe, build, Seq("source"), "ts", "ts", Seq("asof_v"),
        numChunks = 8, rightSeq = Some("seq"))
        .agg(count(col("asof_v")), count(lit(1)))
        .explain("formatted")
    }

    println("==== q64 packing census (two-phase prefix sum) ====")
    queries.DocQueries.packCensusDocs(spark, "/root/testdata/sf0.01").explain("formatted")

    println("==== q68 materialized packing ====")
    queries.DocQueries.packSequencesDocs(spark, "/root/testdata/sf0.01").explain("formatted")

    println("==== q69 decontamination (broadcast gram join check) ====")
    queries.DocQueries.decontaminate(spark, "/root/testdata/sf0.01").explain("formatted")

    println("==== q70 vocab top-k (window AFTER aggregate check) ====")
    queries.DocQueries.vocabTopK(spark, "/root/testdata/sf0.01").explain("formatted")

    spark.stop()
  }
}
