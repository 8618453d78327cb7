package graft
import graft.sources.TokenFixture
import org.apache.spark.sql.SparkSession

/** Dev probe: the metricalize bench shape's physical plan with AQE OFF (the
  * scaling children's configuration) — looking for a SortMergeJoin keyed on
  * the 8-value series key where the code expects a broadcast, and for any
  * data-sized exchange beyond the chunked-window shuffle.
  */
object MzPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.functions.Metricalize
    val obs = TokenFixture.deriveObs(TokenFixture.tokenTable(spark, 200000, withTokens = false))
      .select(col("source"), col("value"), col("seq"))
    val specs = Seq(
      Metricalize.MetricSpec("toks", "counter", "col:value",
        tagPaths = Map("src" -> "col:source")),
      Metricalize.MetricSpec("toks", "gauge", "col:value",
        tagPaths = Map("src" -> "col:source")))
    val out = Metricalize.metricalize(obs, "source", specs, col("seq"), numChunks = 64,
      ordBounds = Some((0L, 400000L)))
    out.explain("formatted")
  }
}
