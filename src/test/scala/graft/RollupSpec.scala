package graft

import graft.model.{RollupPoint, Schemas}
import graft.ref.RefRollup
import graft.sources.TokenFixture
import graft.tiers.{TierCascade, TierRollup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark rollup vs the single-node oracle (bit-for-bit; token-count values are
  * integral so f64 sums are order-insensitive — SURVEY.md §7.5.1).
  */
class RollupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def obsDf(n: Long, skewed: Boolean = false): DataFrame =
    TokenFixture.deriveObs(TokenFixture.tokenTable(spark, n, skewed = skewed, withTokens = false))
      .select("series", "ts", "seq", "value")

  private def collectTier(df: DataFrame): Map[(String, Long), RollupPoint] =
    df.collect().map { r =>
      val p = RollupPoint(r.getAs[String]("series"), r.getAs[Long]("bucket"),
        r.getAs[Double]("sum_v"), r.getAs[Long]("cnt"), r.getAs[Double]("min_v"),
        r.getAs[Double]("max_v"), r.getAs[Double]("last_v"), r.getAs[Long]("last_ts"),
        r.getAs[Long]("last_seq"))
      (p.series, p.bucket) -> p
    }.toMap

  private def oracleObs(n: Long): Seq[(String, Long, Long, Double)] = {
    val rows = obsDf(n).collect()
    rows.map(r => (r.getAs[String]("series"), r.getAs[Long]("ts"),
      r.getAs[Long]("seq"), r.getAs[Double]("value"))).toSeq
  }

  test("1m rollup matches oracle bit-for-bit (10k rows)") {
    val pts = oracleObs(10000)
    val expected = RefRollup.rollup(pts, 60L).map(p => (p.series, p.bucket) -> p).toMap
    val got = collectTier(TierRollup.fromObs(obsDf(10000), 60L))
    assert(got.size == expected.size)
    expected.foreach { case (k, e) =>
      val g = got(k)
      assert(g == e, s"cell $k: got $g expected $e")
    }
  }

  test("salted two-phase rollup is identical to unsalted (skewed fixture)") {
    val obs = obsDf(20000, skewed = true)
    val plain = collectTier(TierRollup.fromObs(obs, 60L))
    val salted = collectTier(TierRollup.fromObsSalted(obs, 60L, salts = 8))
    assert(plain == salted)
  }

  test("tier cascade 1m->1h->1d equals oracle merge at every tier") {
    val pts = oracleObs(10000)
    val o1m = RefRollup.rollup(pts, 60L)
    val o1h = RefRollup.mergeTier(o1m, 3600L)
    val o1d = RefRollup.mergeTier(o1h, 86400L)
    val s1m = TierRollup.fromObs(obsDf(10000), 60L)
    val s1h = TierRollup.mergeTier(s1m, 3600L)
    val s1d = TierRollup.mergeTier(s1h, 86400L)
    Seq((o1h, s1h, "1h"), (o1d, s1d, "1d")).foreach { case (o, s, tag) =>
      val om = o.map(p => (p.series, p.bucket) -> p).toMap
      val sm = collectTier(s)
      assert(sm.size == om.size, s"$tag size")
      om.foreach { case (k, e) => assert(sm(k) == e, s"$tag cell $k") }
    }
  }

  test("histogram tier matches oracle cumulative buckets and merges across tiers") {
    val pts = oracleObs(5000)
    val ladder = Schemas.bucketLadder
    // oracle per (series, 1h bucket)
    val byCell = pts.groupBy(p => (p._1, math.floorDiv(p._2, 3600L) * 3600L))
    val expected = byCell.map { case (k, vs) =>
      k -> RefRollup.histogram(vs.sortBy(v => (v._2, v._3)).map(_._4), ladder)
    }
    val got1m = TierRollup.histogramFromObs(obsDf(5000), ladder, 60L)
    val got1h = TierRollup.mergeHistogramTier(got1m, ladder.length, 3600L)
    val gotMap = got1h.collect().map { r =>
      (r.getAs[String]("series"), r.getAs[Long]("bucket")) ->
        (r.getAs[Long]("h_count"), r.getAs[Double]("h_sum"),
          r.getAs[Seq[Long]]("h_buckets").toArray)
    }.toMap
    assert(gotMap.size == expected.size)
    expected.foreach { case (k, (ec, es, eb)) =>
      val (gc, gs, gb) = gotMap(k)
      assert(gc == ec && gs == es && gb.sameElements(eb), s"hist cell $k")
    }
  }

  test("fused 1m stage: tier and histogram projections equal the separate forms exactly") {
    val obs = obsDf(20000, skewed = true)
    val ladder = Schemas.bucketLadder
    val fused = TierRollup.fromObsWithHistogram(obs, ladder, 60L)
    assert(collectTier(TierRollup.tierColumns(fused)) ==
      collectTier(TierRollup.fromObs(obs, 60L)))
    def histMap(df: DataFrame) = df.collect().map { r =>
      (r.getAs[String]("series"), r.getAs[Long]("bucket")) ->
        ((r.getAs[Long]("h_count"), r.getAs[Double]("h_sum"),
          r.getAs[Seq[Long]]("h_buckets").toList))
    }.toMap
    val sep = TierRollup.histogramFromObs(obs, ladder, 60L)
    assert(TierRollup.histColumns(fused).columns.sameElements(sep.columns))
    assert(histMap(TierRollup.histColumns(fused)) == histMap(sep))
  }

  test("fused 1m stage plan: ONE exchange, hash aggregation, no sort-based fallback") {
    val fused = TierRollup.fromObsWithHistogram(obsDf(1000), Schemas.bucketLadder, 60L)
    fused.count() // finalize the adaptive plan
    val plan = fused.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly 1 shuffle:\n$plan")
    assert(plan.contains("HashAggregate"), s"expected HashAggregate:\n$plan")
    assert(!plan.contains("ObjectHashAggregate") && !plan.contains("SortAggregate")
      && !plan.contains("\n+- Sort ") && !plan.contains(" Sort ["),
      s"fused agg must stay hash-based and sort-free:\n$plan")
  }

  test("co-partitioned cascade: every tier, histogram and page byte-stream " +
      "equals the standard run (skewed fixture)") {
    import java.nio.file.Files
    val obs = obsDf(20000, skewed = true)
    def runAll(copart: Boolean): Map[String, Set[String]] = {
      val base = Files.createTempDirectory("copart").toString
      val results = TierCascade.run(spark, obs, base, seriesBuckets = 4,
        salts = 1, withHistograms = true, withPages = true,
        copartition = copart)
      results.map { tr =>
        val rows = tr.table.read().drop("pk").collect().map { r =>
          r.toSeq.map {
            case b: Array[Byte] => b.map("%02x".format(_)).mkString
            case s: Seq[_] => s.mkString(",")
            case x => String.valueOf(x)
          }.mkString("|")
        }.toSet
        tr.name -> rows
      }.toMap
    }
    val std = runAll(copart = false)
    val cop = runAll(copart = true)
    assert(std.keySet == cop.keySet)
    std.foreach { case (name, rows) =>
      assert(cop(name) == rows, s"tier $name diverges under copartition")
    }
  }

  test("co-partitioned fused agg plans exchange-free above the arrangement") {
    val arrangedObs = obsDf(5000)
      .repartition(col("series"))
      .sortWithinPartitions("series", "ts", "seq")
      .persist()
    try {
      arrangedObs.count()
      val fused = TierRollup.fromObsWithHistogram(arrangedObs,
        Schemas.bucketLadder, 60L)
      fused.count()
      val plan = fused.queryExecution.executedPlan.toString
      // the only exchange is INSIDE the cached arrangement; above the cache
      // boundary the aggregate must be exchange-free and hash-based
      val above = plan.split("InMemoryRelation").head
      assert(!above.contains("Exchange"),
        s"expected no exchange above the arrangement cache:\n$plan")
      assert(above.contains("HashAggregate") && !above.contains("SortAggregate"),
        s"expected hash aggregation:\n$plan")
    } finally arrangedObs.unpersist()
  }

  test("histogram_quantile: interpolation, first-rung lower bound 0, overflow fallback, empty null") {
    import spark.implicits._
    val ladder = Array(1.0, 2.0, 5.0, 10.0)
    // (name, h_count, cumulative h_buckets)
    val cells = Seq(
      ("interp", 10L, Seq(2L, 3L, 5L, 10L)), // ranks land inside rungs
      ("overflow", 5L, Seq(1L, 1L, 1L, 1L)), // 4 of 5 obs above the last rung
      ("empty", 0L, Seq(0L, 0L, 0L, 0L))
    ).toDF("name", "h_count", "h_buckets")
    val got = cells.select(col("name"),
        TierRollup.histogramQuantile(ladder, 0.20).as("p20"),
        TierRollup.histogramQuantile(ladder, 0.50).as("p50"),
        TierRollup.histogramQuantile(ladder, 0.90).as("p90"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    // interp: rank(.2)=2 → first rung [0,1], full: 0+1*(2-0)/(2-0)=1.0;
    // rank(.5)=5 → rung [2,5], prev 3: 2+3*(5-3)/(5-3)=5.0;
    // rank(.9)=9 → rung [5,10], prev 5: 5+5*(9-5)/(10-5)=9.0
    assert(got("interp") == (Some(1.0), Some(5.0), Some(9.0)))
    // overflow: rank(.5)=2.5 and rank(.9)=4.5 exceed c_last=1 → highest
    // finite bound; rank(.2)=1.0 still lands in the first rung: 0+1*1/1=1.0
    assert(got("overflow") == (Some(1.0), Some(10.0), Some(10.0)))
    assert(got("empty") == (None, None, None))
  }

  test("delta/rate matches oracle incl. counter reset; first point is null") {
    import spark.implicits._
    // hand-built cumulative counter with one reset, two series
    val rows = Seq(
      ("a", 0L, 1L, 10.0), ("a", 60L, 2L, 15.0), ("a", 120L, 3L, 3.0), // reset at 120
      ("a", 180L, 4L, 9.0), ("b", 0L, 5L, 1.0), ("b", 60L, 6L, 1.0))
    val tier = TierRollup.fromObs(rows.toDF("series", "ts", "seq", "value"), 60L)
    val got = TierRollup.deltaRate(tier).select("series", "bucket", "delta", "rate")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    val oracleA = RefRollup.deltaRate(Seq((0L, 10.0), (60L, 15.0), (120L, 3.0), (180L, 9.0)))
      .map { case (ts, d, rt) => ("a", ts, d, rt) }
    val oracleB = RefRollup.deltaRate(Seq((0L, 1.0), (60L, 1.0)))
      .map { case (ts, d, rt) => ("b", ts, d, rt) }
    assert(got == (oracleA ++ oracleB).toSet)
  }

  test("gap-fill: spine is complete, gaps marked, LOCF fills from last observation") {
    import spark.implicits._
    val rows = Seq(("s", 0L, 1L, 5.0), ("s", 180L, 2L, 7.0)) // buckets 0 and 180, gap at 60,120
    val tier = TierRollup.fromObs(rows.toDF("series", "ts", "seq", "value"), 60L)
    val filled = TierRollup.gapFill(tier, 60L).orderBy("bucket")
      .select("bucket", "is_gap", "last_v_filled").collect()
    assert(filled.map(_.getLong(0)).sameElements(Array(0L, 60L, 120L, 180L)))
    assert(filled.map(_.getBoolean(1)).sameElements(Array(false, true, true, false)))
    assert(filled.map(_.getDouble(2)).sameElements(Array(5.0, 5.0, 5.0, 7.0)))
  }

  test("gap-fill spine size is proportional to per-series span, not global range") {
    import spark.implicits._
    // sparse series: "early" lives in buckets [0, 120], "late" in [86400, 86460]
    // — a global-bounds spine would be 2 × 1441 rows; per-series is 3 + 2
    val rows = Seq(("early", 0L, 1L, 1.0), ("early", 120L, 2L, 2.0),
      ("late", 86400L, 3L, 3.0), ("late", 86460L, 4L, 4.0))
    val tier = TierRollup.fromObs(rows.toDF("series", "ts", "seq", "value"), 60L)
    val perSeries = TierRollup.gapFill(tier, 60L)
    assert(perSeries.count() == 5)
    val global = TierRollup.gapFill(tier, 60L, globalBounds = true)
    assert(global.count() == 2 * 1442L)
    // LOCF still correct on the per-series path
    val early = perSeries.filter(col("series") === "early").orderBy("bucket")
      .select("bucket", "last_v_filled").as[(Long, Double)].collect().toSeq
    assert(early == Seq((0L, 1.0), (60L, 1.0), (120L, 2.0)))
  }

  test("fixture gaps are filled: gapped fixture yields complete spine") {
    val obs = TokenFixture.deriveObs(
      TokenFixture.tokenTable(spark, 3000, withGaps = true, withTokens = false))
      .select("series", "ts", "seq", "value")
    val tier = TierRollup.fromObs(obs, 60L)
    val filled = TierRollup.gapFill(tier, 60L)
    val perSeries = filled.groupBy("series").agg(
      count(lit(1)).as("n"),
      ((max(col("bucket")) - min(col("bucket"))) / 60 + 1).as("want"))
    assert(perSeries.filter(col("n") =!= col("want")).count() == 0)
    assert(filled.filter(col("is_gap") && col("last_v_filled").isNull).count() +
      filled.filter(col("is_gap")).count() > 0) // gaps exist and are marked
  }

  test("token-array equality: derived obs preserve tokens vs the source table") {
    val tok = TokenFixture.tokenTable(spark, 2000)
    val derived = TokenFixture.deriveObs(tok)
    // join back on doc_id and compare token arrays
    val src = tok.select(col("doc_id"), col("tokens").as("src_tokens"))
    val bad = derived.join(src, "doc_id")
      .filter(not(col("tokens") === col("src_tokens"))).count()
    assert(bad == 0)
    assert(derived.count() == 2000)
  }

  test("retention: TTL filter keeps only cells near the high-water mark") {
    import spark.implicits._
    val rows = (0 until 100).map(i => ("s", i * 60L, i.toLong, 1.0))
    val tier = TierRollup.fromObs(rows.toDF("series", "ts", "seq", "value"), 60L)
    val kept = TierRollup.retain(tier, ttlSec = 600L)
    assert(kept.count() == 10) // buckets within (hwm-600, hwm]
    assert(kept.agg(min("bucket")).head().getLong(0) == (99 * 60 - 600 + 60))
  }
}
