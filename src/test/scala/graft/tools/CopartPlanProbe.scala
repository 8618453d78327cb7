package graft.tools

import graft.sources.TokenFixture
import graft.tiers.TierRollup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: verifies the co-partitioned cascade's core claim — that the
  * fused 1m aggregate over the series-hash-arranged cache plans WITHOUT an
  * Exchange (HashPartitioning(series) satisfies
  * ClusteredDistribution(series, bucket)) — and prints the physical plans.
  *   sbt "Test/runMain graft.tools.CopartPlanProbe"
  */
object CopartPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("copart-plan-probe")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val obs = TokenFixture.deriveObs(
      TokenFixture.tokenTable(spark, 200000, skewed = true, withTokens = false))
      .select("series", "ts", "seq", "value")
    val arranged = obs
      .repartition(col("series"))
      .sortWithinPartitions("series", "ts", "seq")
      .persist()
    arranged.count()
    val fused = TierRollup.fromObsWithHistogram(
      arranged, graft.model.Schemas.bucketLadder, 60L)
    val plan = fused.queryExecution.executedPlan.toString
    // count only ABOVE the cache boundary: the one exchange inside the
    // InMemoryRelation IS the shared arrangement
    val above = plan.split("InMemoryRelation").head
    val nEx = "Exchange".r.findAllIn(above).size
    println(plan.linesIterator.take(40).mkString("\n"))
    println(s"COPART_PLAN exchanges_above_cache=$nEx (want 0)")
    // baseline: same agg over the unarranged obs must have exactly 1
    val base = TierRollup.fromObsWithHistogram(
      obs, graft.model.Schemas.bucketLadder, 60L)
    val nExBase = "Exchange".r
      .findAllIn(base.queryExecution.executedPlan.toString).size
    println(s"COPART_PLAN baseline_exchanges=$nExBase (want 1)")
    spark.stop()
  }
}
