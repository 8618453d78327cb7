package graft.tools
import graft.sources.TokenFixture
import org.apache.spark.sql.SparkSession

/** Dev probe: the metricalize bench shape's physical plan with AQE OFF (the
  * scaling children's configuration) — asserts by eyeball the single-pass
  * shape: ONE data-sized Exchange (the chunked replay window), the chunk
  * aggregation in place on the window's partition keys (no second data
  * exchange), no join, and only tiny-frame exchanges after.
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
