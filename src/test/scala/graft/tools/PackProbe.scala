package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: paired-level scaling of the materialized sequence packer
  * (ops/Pack.packSequences) over a cached synthetic corpus. One JVM per
  * level (bench methodology — sequential sessions in one JVM degrade):
  *   sbt "Test/runMain graft.PackProbe 2"   # lo
  *   sbt "Test/runMain graft.PackProbe 8"   # hi
  * Input: ~4M docs / ~95M tokens, parquet-cached under /tmp/graft_bench.
  */
object PackProbe {
  def main(args: Array[String]): Unit = {
    // machine-read JSON: pin the locale so %.2f never emits comma decimals
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = args.headOption.map(_.toInt).getOrElse(8)
    val nDocs = if (args.length > 1) args(1).toLong else 4000000L
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // AQE off in scaling children (bench protocol: fixed stage shapes)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.local.dir", "/dev/shm/pack_probe_local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val path = s"/tmp/graft_bench/packdocs_n$nDocs"
    if (!new java.io.File(path).exists()) {
      spark.range(nDocs).select(
          col("id").as("doc_id"),
          concat(lit("src"), pmod(col("id"), lit(32L))).as("source"),
          transform(
            sequence(lit(1), (pmod(col("id"), lit(33L)) + lit(8)).cast("int")),
            i => concat(lit("t"), pmod(col("id"), lit(997L)), lit("_"), i))
            .as("toks"))
        .write.mode("overwrite").parquet(path)
    }

    val docs = spark.read.parquet(path)
    // warmup: JIT + parquet footer cache
    docs.limit(200000).select(sum(size(col("toks")))).collect()

    val t0 = System.nanoTime()
    graft.ops.Pack.packSequences(docs, "source", "doc_id", "toks", budget = 2048L,
        orderBounds = Some((0L, nDocs - 1)))
      .write.mode("overwrite").format("noop").save()
    val sec = (System.nanoTime() - t0) / 1e9
    val nTok = docs.select(sum(size(col("toks")))).head().getLong(0)
    println(f"""PACK_PROBE {"cpus":$cpus,"n_docs":$nDocs,"n_tok":$nTok,"sec":$sec%.2f,"tok_per_sec":${(nTok / sec).toLong}}""")
    spark.stop()
  }
}
