package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.TokenFixture
import graft.functions.Metricalize

/** Dev probe: stage-by-stage wall of the metricalize bench shape at local[2]
  * (the scaling pair's lo level) — explode+skey pass vs chunked window vs
  * per-chunk aggs vs the full operator.
  */
object MzBreakdownProbe {
  def main(args: Array[String]): Unit = {
    val frac = if (args.nonEmpty) args(0).toLong else 32L
    val spark = SparkSession.builder().master(sys.env.getOrElse("MZ_PROBE_MASTER", "local[2]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("MZ_PROBE_PARTS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.local.dir", { val d = "/dev/shm/graft-spark-local"; new java.io.File(d).mkdirs(); d })
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val obs = TokenFixture.deriveObs(spark.read.parquet("/tmp/graft_bench/raw_v2_n48000000"))
      .filter(pmod(col("seq"), lit(frac)) === 0)
      .select(col("source"), col("value"), col("seq")).persist()
    val b = obs.agg(count(lit(1)), min(col("seq")), max(col("seq"))).head()
    println(s"rows=${b.getLong(0)}")
    val bounds = Some((b.getLong(1), b.getLong(2)))
    val specs = Seq(
      Metricalize.MetricSpec("toks", "counter", "col:value", tagPaths = Map("src" -> "col:source")),
      Metricalize.MetricSpec("toks", "gauge", "col:value", tagPaths = Map("src" -> "col:source")))
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // replicate the operator's internals piecewise
    import org.apache.spark.sql.expressions.Window
    val kinds = Seq("counter", "gauge")
    def keyed = {
      val perSpec = obs.select(explode(array(
        struct(lit("toks").as("name"), map_filter(map(lit("src"), col("source").cast("string")), (_, tv) => tv.isNotNull).as("tags"), lit(0).as("kind"), col("value").cast("double").as("v"), (col("seq").cast("long") * 2).as("ord"), lit(0).as("sidx")),
        struct(lit("toks").as("name"), map_filter(map(lit("src"), col("source").cast("string")), (_, tv) => tv.isNotNull).as("tags"), lit(1).as("kind"), col("value").cast("double").as("v"), (col("seq").cast("long") * 2 + 1).as("ord"), lit(1).as("sidx")))).as("_m"))
        .select(col("_m.name").as("name"), col("_m.tags").as("tags"), col("_m.kind").as("kind"), col("_m.v").as("v"), col("_m.ord").as("ord"), col("_m.sidx").as("sidx"))
        .filter(col("v").isNotNull)
      perSpec.withColumn("skey", array_sort(map_entries(col("tags")))).drop("tags")
    }
    val (lo, hi) = (bounds.get._1 * 2, bounds.get._2 * 2 + 1)
    val chunkW = math.max(1L, (hi - lo) / 64 + 1)
    def chunked = keyed.withColumn("_chunk",
      greatest(lit(0L), least(lit((hi - lo) / chunkW), floor((col("ord") - lo) / chunkW).cast("long"))))
    time("A explode+skey pass (agg count)") { keyed.agg(count(lit(1)), max(col("ord"))).head() }
    time("B chunked window lag + agg") {
      val wc = Window.partitionBy(col("name"), col("skey"), col("_chunk")).orderBy(col("ord"))
      chunked.withColumn("_pk", lag(col("kind"), 1).over(wc))
        .agg(sum(when(col("_pk").isNotNull && col("kind") =!= col("_pk"), 1L).otherwise(0L))).head()
    }
    time("C perChunk hash agg") {
      chunked.groupBy(col("name"), col("skey"), col("_chunk"))
        .agg(min_by(col("kind"), col("ord")), max_by(col("kind"), col("ord")),
          max(when(col("kind") =!= 0, col("ord"))), max(when(col("kind") =!= 1, col("ord"))))
        .agg(count(lit(1))).head()
    }
    time("D full metricalize") {
      Metricalize.metricalize(obs, "source", specs, col("seq"), numChunks = 64, ordBounds = bounds)
        .agg(sum(col("mismatches")), count(lit(1))).head()
    }
    time("D2 full metricalize (repeat)") {
      Metricalize.metricalize(obs, "source", specs, col("seq"), numChunks = 64, ordBounds = bounds)
        .agg(sum(col("mismatches")), count(lit(1))).head()
    }
    spark.stop()
  }
}
