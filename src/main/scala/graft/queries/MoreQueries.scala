package graft.queries

import graft.functions.{Pages, TagOps}
import graft.lake.LakeTable
import graft.ops.{CardinalityLimit, Dedup, GeoIp, Multimodal, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second operator batch: cardinality enforcement, fanout/union, VTL-style
  * rewrite, summary quantiles, and the hash-based near-dup / ANN / page /
  * multimodal operators (those are ScalaTest-verified; hash functions are not
  * reproducible in DuckDB SQL, so the driver records rows-only checks).
  */
object MoreQueries {

  /** cardinality limiter, enforcement mode
    * (/root/reference/src/transforms/cardinality.rs:262-292, Drop action):
    * per event_type only the first 30 distinct user_ids (by first-seen time)
    * pass; later users' events are dropped. Deterministic because ts is unique.
    */
  def cardinalityEnforce(s: SparkSession, dir: String): DataFrame = {
    val e = EventQueries.events(s, dir)
    val firstSeen = e.groupBy(col("event_type"), col("user_id"))
      .agg(min(col("ts")).as("fts"))
    val ranked = firstSeen.withColumn("rn",
      row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("fts"), col("user_id")))) // user_id: deterministic at fts ties
      .filter(col("rn") <= 30)
      .select(col("event_type"), col("user_id"))
    e.join(broadcast(ranked), Seq("event_type", "user_id"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("kept_cnt"), countDistinct(col("user_id")).as("kept_users"))
      .orderBy(col("event_type"))
  }

  /** fanout/union (SURVEY §2.6: multiple inputs merged,
    * lib/framework/src/topology/fanout.rs): two filtered branches of one
    * cached parent unioned back (unionByName), then aggregated.
    */
  def unionFanout(s: SparkSession, dir: String): DataFrame = {
    val e = EventQueries.events(s, dir)
    val highValue = e.filter(col("value") > 100).select(col("event_type"))
    val evenUsers = e.filter(col("user_id") % 2 === 0).select(col("event_type"))
    highValue.unionByName(evenUsers)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))
  }

  /** rewrite transform (VTL program analog, SURVEY §2.2/§2.7): a withColumn
    * chain of scalar functions — string case ops, abs/round math, regexp —
    * all built-in Catalyst expressions, then aggregated.
    */
  def rewriteVtl(s: SparkSession, dir: String): DataFrame =
    EventQueries.events(s, dir)
      .withColumn("kind", upper(col("event_type")))
      .withColumn("dev", abs(col("value") - 50.0))
      .withColumn("has_big_num", col("props").rlike("[0-9]{2,}"))
      .groupBy(col("kind"))
      .agg(
        round(sum(col("dev")), 4).as("dev_sum"),
        max(length(col("props"))).as("max_props_len"),
        sum(when(col("has_big_num"), 1L).otherwise(0L)).as("big_num_cnt"))
      .orderBy(col("kind"))

  /** summary quantiles (vertex Summary carries quantiles; merge is a no-op —
    * /root/reference/lib/event/src/metric/mod.rs:62 — so quantiles are always
    * computed from raw observations, exactly as here: exact interpolated
    * percentiles per series).
    */
  def summaryQuantiles(s: SparkSession, dir: String): DataFrame =
    EventQueries.events(s, dir)
      .groupBy(col("event_type"))
      // ONE percentile buffer for all three quantiles (round 6): three
      // scalar percentile(φ) aggregates each built their own
      // TypedImperativeAggregate value buffer over the same column; the
      // array form interpolates every φ from one shared buffer — identical
      // per-φ arithmetic, a third of the per-group state
      .agg(expr("percentile(value, array(0.5, 0.9, 0.99))").as("_p"),
        count(lit(1)).as("cnt"))
      .select(col("event_type"),
        round(col("_p")(0), 4).as("p50"),
        round(col("_p")(1), 4).as("p90"),
        round(col("_p")(2), 4).as("p99"),
        col("cnt"))
      .orderBy(col("event_type"))

  /** q41: cardinality limiter, probabilistic mode
    * (/root/reference/src/transforms/cardinality.rs:127-206: an sbbf Bloom
    * filter replaces the exact HashSet when the tag universe outgrows
    * memory). The Spark-native sketch is HLL (approx_count_distinct): the
    * exact path shuffles every (type, user) pair, the sketch path ships
    * constant-size registers per group — the shape that survives 10^9 users.
    * The query asserts the sketch lands within 5% of exact, so the oracle is
    * the exact count + `true`.
    */
  def cardinalitySketch(s: SparkSession, dir: String): DataFrame =
    EventQueries.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("distinct_users"),
        approx_count_distinct(col("user_id"), rsd = 0.02).as("_approx"),
        count(lit(1)).as("cnt"))
      .select(col("event_type"), col("distinct_users"), col("cnt"),
        (abs(col("_approx") - col("distinct_users")) <=
          greatest(col("distinct_users") * 0.05, lit(8.0))).as("sketch_ok"))
      .orderBy(col("event_type"))

  /** q42: summary quantiles, sketch mode — approx_percentile (GK sketch,
    * mergeable, bounded memory) beside the exact percentile used by the q26
    * oracle path. Vertex Summary quantiles are non-mergeable and recomputed
    * from raw anyway (/root/reference/lib/event/src/metric/mod.rs:62), so an
    * approximate contract is the defensible 100 TB path: exact `percentile`
    * buffers every value per group (ObjectHashAggregate), the sketch ships a
    * fixed-size summary. GK guarantees RANK error (not value error), so the
    * assertion is rank-windowed: each sketch quantile must land inside the
    * exact [q−0.01, q+0.01] value window (which covers adjacent order
    * statistics at small n and tightens naturally at scale); the oracle is
    * exact + `true`.
    */
  def summaryQuantilesSketch(s: SparkSession, dir: String): DataFrame = {
    // ONE exact-percentile buffer for the 9 needed φs (targets + their
    // ±0.01 rank windows) and ONE GK sketch (round 6): the scalar form
    // carried 9 independent percentile buffers plus 4 textual copies of
    // the approx_percentile call per group. The array form interpolates
    // each φ from the same shared buffer — per-φ arithmetic identical.
    val pcts = Seq(0.49, 0.5, 0.51, 0.89, 0.9, 0.91, 0.98, 0.99, 1.0)
    def inWindow(ap: Column, lo: Int, hi: Int): Column =
      ap.between(col("_p")(lo), col("_p")(hi))
    EventQueries.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        expr(s"percentile(value, array(${pcts.mkString(", ")}))").as("_p"),
        expr("approx_percentile(value, array(0.5, 0.9, 0.99), 10000)").as("_ap"),
        count(lit(1)).as("cnt"))
      .select(col("event_type"),
        round(col("_p")(1), 4).as("p50"),
        round(col("_p")(4), 4).as("p90"),
        round(col("_p")(7), 4).as("p99"),
        col("cnt"),
        (inWindow(col("_ap")(0), 0, 2) && inWindow(col("_ap")(1), 3, 5) &&
          inWindow(col("_ap")(2), 6, 8)).as("sketch_ok"))
      .orderBy(col("event_type"))
  }

  /** MinHash LSH near-dup dedup over documents, provable-recall slice: a
    * deterministic clone of every 50th doc (id+10⁷) is unioned in, and the
    * run verifies candidates at jaccard == 1.0. Identical shingle sets ⇒
    * identical MinHash signatures ⇒ ALL bands collide, so banding recall is
    * exactly 1.0 (the only cut, the maxBucket skew guard, is sized far above
    * any dup-group here) and DuckDB's identical-shingle-set join is an exact
    * oracle — no doc pair under ~400 shingles can round a sub-1.0 jaccard up
    * to 1.0. The graded threshold mode (0.5, planted near-dups) stays
    * ScalaTest-verified in DedupSimilaritySpec.
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val d = DocQueries.documents(s, dir)
    val clones = d.filter(pmod(col("doc_id"), lit(50)) === 0)
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
    Dedup.minhashDedup(d.unionByName(clones), "doc_id", "text",
      threshold = 1.0, maxBucket = 256)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash near-dup pairs over documents (ScalaTest-verified against a
    * brute-force oracle). maxHamming=3 with 4 bands is the full-recall
    * contract (banding catches every pair with hamming ≤ bands−1; the
    * round-1 maxHamming=16 call silently returned a recall subset).
    */
  def simhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(DocQueries.documents(s, dir), "doc_id", "text", maxHamming = 3)
      .orderBy(col("doc_a"), col("doc_b"))

  /** Exact n-gram Jaccard on deterministic consecutive doc pairs (has a
    * DuckDB oracle: list_intersect/list_distinct).
    */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val d = DocQueries.documents(s, dir)
    // repartition BEFORE branching: both join inputs derive from the same
    // exchange subtree, so ReuseExchange shingles the corpus once (two plain
    // projection branches re-ran the full shingle pass per side); the `a`
    // side's partitioning (hash(doc_id) = hash(doc_a)) already satisfies the
    // join, so only the shifted `b` side re-shuffles
    val sh = d.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .repartition(col("doc_id"))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select((col("doc_id") - 1).as("doc_a"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, "doc_a")
      .select(col("doc_a"), col("doc_b"),
        round(Dedup.jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .orderBy(col("doc_a"))
  }

  /** LSH-bucketed approximate nearest neighbours (ScalaTest-verified recall
    * vs brute force).
    */
  def annLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(DocQueries.embeddings(s, dir), "vec_id", "embedding",
      queryId = 0L, k = 10)

  /** Multi-probe LSH ANN (ScalaTest-verified recall monotonicity vs
    * single-probe and brute force): same index, 1-bit-flip probe
    * neighborhood — the recall fix for the round-1 single-probe limit.
    */
  def annMultiProbe(s: SparkSession, dir: String): DataFrame =
    Similarity.lshTopKMultiProbe(DocQueries.embeddings(s, dir), "vec_id", "embedding",
      queryId = 0L, k = 10, probeHamming = 1)

  /** IVF ANN top-5 for five query vectors over the inverted-file index
    * (16 deterministic seed centroids, nProbe=2). Every step is
    * deterministic and arithmetic-identical cross-engine (sequential IEEE
    * double folds, rankings on HALF_UP-rounded scores), so DuckDB
    * recomputing assignment + probed-list brute force is an EXACT oracle —
    * unlike the hash-based LSH indexes (q30/q46), whose plane constants are
    * JVM-seeded. Recall properties (nProbe monotonicity, nProbe=16 ≡ brute
    * force) are IvfSpec's.
    */
  def annIvf(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(DocQueries.embeddings(s, dir), "vec_id", "embedding",
      queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5, nCentroids = 16, nProbe = 2)
      .orderBy(col("query_id"), col("rank"))

  /** Gorilla page compression over the events stream: one binary page per
    * (event_type, day), DECODED BACK into a census (point count, ts span,
    * rounded value sum) that DuckDB recomputes from the raw events — a hard
    * cross-engine oracle for the full encode→decode path (byte sizes and the
    * property-tested codec stay in ScalaTest).
    */
  def gorillaPages(s: SparkSession, dir: String): DataFrame = {
    val obs = EventQueries.obs(s, dir)
    Pages.pageCensus(Pages.pagesFromObs(obs, 86400L))
      .orderBy(col("series"), col("bucket"))
  }

  /** Multimodal decode: REAL BMP/WAV header parsers over synthesized valid
    * payloads (every 7th deliberately malformed and counted, never thrown);
    * every extracted dimension is doc_id arithmetic, so the DuckDB oracle
    * recomputes them exactly.
    */
  def multimodalDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.pipeline(s, dir)

  /** q47: cardinality limiter, DropTag action
    * (/root/reference/src/transforms/cardinality.rs:262-292): events KEEP
    * flowing, but the `user` tag is stripped from events whose user wasn't
    * among the first 30 distinct values by first-seen time — the less
    * destructive enforcement mode (q23 is the Drop-event mode).
    */
  def cardinalityDropTag(s: SparkSession, dir: String): DataFrame = {
    val e = EventQueries.events(s, dir)
    val tagged = e.withColumn("tags", map(
      lit("type"), col("event_type"),
      lit("user"), col("user_id").cast("string")))
    CardinalityLimit.dropTag(tagged, "tags", "user", col("ts"), limit = 30)
      .groupBy(TagOps.canonicalTags(col("tags")).as("series"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("series"))
  }

  /** q48: geoip as a REAL range lookup (longest-prefix analog,
    * /root/reference/src/transforms/geoip.rs:22-60): deterministic CIDR-style
    * ranges derived from the nation dim, IPs from user_id arithmetic, one
    * broadcast binary-search probe per event, misses → 'unknown'. (q34 stays
    * as the equality dim-join case.)
    */
  def geoipRange(s: SparkSession, dir: String): DataFrame = {
    val e = EventQueries.events(s, dir)
    val block = 16777216L // one /8-style block per nation
    val ranges = s.read.parquet(s"$dir/nation.parquet").select(
      (col("n_nationkey").cast("long") * block).as("lo"),
      (col("n_nationkey").cast("long") * block +
        (pmod(col("n_nationkey"), lit(8)) + 1).cast("long") * 1048576L - 1).as("hi"),
      col("n_name").as("value"))
    val ip = pmod(col("user_id").cast("long"), lit(25L)) * block +
      pmod(col("user_id").cast("long") * 9973L, lit(block))
    GeoIp.enrich(e, ip, ranges)
      .groupBy(col("geo"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_v"))
      .orderBy(col("geo"))
  }

  /** q50: set ops — intersect/except (SURVEY §2.6: absent as a reference
    * runtime operator, used as the expected-vs-got diff in its tests; the
    * north-rule resume proofs use the same shape). Two derived projections of
    * the stream are diffed: rows only in A (except), only in B, and in both
    * (intersect) — each a hash-partitioned set op, no window, no sort.
    */
  def setOpsDiff(s: SparkSession, dir: String): DataFrame = {
    val e = EventQueries.events(s, dir)
    val a = e.filter(col("value") > 50).select(col("event_type"), col("user_id"))
    val b = e.filter(col("user_id") % 3 === 0).select(col("event_type"), col("user_id"))
    val onlyA = a.except(b).withColumn("side", lit("only_a"))
    val onlyB = b.except(a).withColumn("side", lit("only_b"))
    val both = a.intersect(b).withColumn("side", lit("both"))
    onlyA.unionByName(onlyB).unionByName(both)
      .groupBy(col("side"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("side"))
  }

  /** q51: embedding-cosine near-dup, exact windowed form (builder-prompt
    * dedup mode): each vector vs its next 8 ids, pairs with cosine >= 0.2 —
    * the deterministic-pair trick (q27's) that makes hash-free similarity
    * DuckDB-oracle-able; the production-scale LSH form is q52.
    */
  private def cosinePairs(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.VectorExprs.ensure(s)
    val e = DocQueries.embeddings(s, dir)
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("_ea"),
      explode(sequence(lit(1L), lit(8L))).as("_off"))
      .withColumn("vec_b", col("vec_a") + col("_off"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("_eb"))
    a.join(b, "vec_b") // equi-join on the generated id, no range join
      .select(col("vec_a"), col("vec_b"),
        round(Similarity.cosine(col("_ea"), col("_eb")), 5).as("cosine"))
      .filter(col("cosine") >= 0.2)
  }

  def cosineNearDup(s: SparkSession, dir: String): DataFrame =
    cosinePairs(s, dir).orderBy(col("vec_a"), col("vec_b"))

  /** q59: near-dup CLUSTER resolution — the q51 pair set closed into
    * duplicate groups by graft.ops.Cluster (large-star/small-star connected
    * components, SoCC'14). Output one row per clustered vector with its
    * component's canonical (minimum) id and the component size — exactly the
    * keep-one-per-group frame a corpus dedup pass consumes. The DuckDB oracle
    * replays the same closure with a recursive CTE over the identical pair
    * set, so the whole operator — pair gen, star rounds, label extraction —
    * is cross-engine-pinned.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val labels = graft.ops.Cluster
      .connectedComponents(cosinePairs(s, dir), "vec_a", "vec_b")
      .select(col("node").as("vec_id"), col("cluster").as("cluster_id"))
    val sizes = labels.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "cluster_id")
      .select(col("vec_id"), col("cluster_id"), col("cluster_size"))
      .orderBy(col("vec_id"))
  }

  /** q52: embedding near-dup via sign-LSH banding, provable-recall slice: a
    * deterministic clone of every 25th vector (id+10⁷) is unioned in and the
    * banding must surface every identical-embedding pair (identical vectors ⇒
    * identical sign signatures ⇒ all bands collide — recall exactly 1.0), so
    * DuckDB's embedding-equality join is an exact oracle. The graded
    * cosine-threshold mode (Similarity.cosineNearDupPairs, probabilistic
    * recall) stays ScalaTest-verified in DedupSimilaritySpec.
    */
  def cosineNearDupLsh(s: SparkSession, dir: String): DataFrame = {
    val e = DocQueries.embeddings(s, dir)
    val clones = e.filter(pmod(col("vec_id"), lit(25)) === 0)
      .withColumn("vec_id", col("vec_id") + lit(10000000L))
    Similarity.identicalVectorPairs(e.unionByName(clones), "vec_id", "embedding")
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** q49: internal-metrics surface
    * (/root/reference/src/sources/internal_metrics.rs): append the events
    * stream into a lake table, then read the pipeline's OWN per-partition
    * commit telemetry (rows per partition, from parquet footers) back as a
    * DataFrame — the oracle recomputes the expected census from the raw
    * table.
    */
  def internalMetricsCensus(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_im").toString
    val lake = new LakeTable(s, base, "events_lake", "event_type")
    lake.append(EventQueries.events(s, dir), "events->lake census")
    lake.internalMetrics()
      .select(col("table_name"), col("part"), col("n_rows"))
      .orderBy(col("part"))
  }

  /** As-of join (SURVEY §2.4): every event picks up the value of the latest
    * "snapshot" event (event_id%20==0) of the same type at or before its ts —
    * composed from union + ordered-window LOCF (graft.tiers.AsOfJoin), one
    * shuffle, no range-join blowup. DuckDB oracle uses its native ASOF JOIN.
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = EventQueries.events(s, dir)
    // microsecond precision: unix_timestamp would truncate to seconds and
    // let a same-second-but-later snapshot leak into the as-of window
    val left = e.select(col("event_id"), col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      .withColumnRenamed("ts_us", "ts")
    val right = e.filter(pmod(col("event_id"), lit(20)) === 0)
      .select(col("event_type"), unix_micros(col("ts").cast("timestamp")).as("ts"),
        col("value").as("asof_v"))
    // caller-supplied µs bounds (testdata events span Jan 2024; a covering
    // superset costs nothing but skips the blocking stats reduce)
    graft.tiers.AsOfJoin.asof(left, right, Seq("event_type"), "ts", "ts", Seq("asof_v"),
      tsBounds = Some((1704067200000000L, 1706745600000000L)))
      .select(col("event_id"), col("event_type"), col("asof_v"))
      .orderBy(col("event_id"))
  }

  /** geoip-style enrichment (SURVEY §2.2): broadcast dimension lookup join —
    * events enriched with a 25-row nation dim, aggregated per nation.
    */
  def enrichJoin(s: SparkSession, dir: String): DataFrame = {
    val e = EventQueries.events(s, dir)
    val nation = s.read.parquet(s"$dir/nation.parquet")
    e.withColumn("nkey", pmod(col("user_id"), lit(25)).cast("int"))
      .join(broadcast(nation), col("nkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_v"))
      .orderBy(col("n_name"))
  }

  /** Prometheus text-format ingestion (SURVEY §2.1): parse exposition lines
    * synthesized deterministically from events, then regroup _bucket/_sum/
    * _count samples into histogram rows (ScalaTest-verified; no DuckDB
    * analog for the parse).
    */
  def promTextParse(s: SparkSession, dir: String): DataFrame = {
    val lines = EventQueries.events(s, dir).filter(col("event_id") < 2000).select(
      concat(lit("graft_value{type=\""), col("event_type"),
        lit("\",user=\""), col("user_id"), lit("\"} "), col("value")).as("line"))
    graft.sources.PromText.parse(s, lines)
      .groupBy(col("name"), element_at(col("labels"), "type").as("type"))
      .agg(count(lit(1)).as("samples"), round(sum(col("value")), 4).as("sum_v"))
      .orderBy(col("type"))
  }

  /** remote-write batch shaping (SURVEY §2.1 sink: <=1000 events per request
    * per tenant, deterministic (ts,seq) packing): per-tenant batch census.
    */
  def remoteWriteBatches(s: SparkSession, dir: String): DataFrame = {
    val e = EventQueries.events(s, dir)
    graft.functions.Exporter.batchSummaries(e, "event_type", "ts", "event_id", maxEvents = 1000,
      tsBounds = Some((1704067200000000L, 1706745600000000L))) // known Jan-2024 µs domain
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_batches"),
        max(col("batch_events")).as("max_batch"),
        min(col("batch_events")).as("min_batch"))
      .orderBy(col("event_type"))
  }

  /** exporter text render (SURVEY §2.1: GET /metrics body ordered by name +
    * canonical sorted labels): render the latest value per series as full
    * exposition lines. Values are floored (the q43 convention) so the
    * double→string formatting is engine-portable and DuckDB can rebuild the
    * exact line strings — the render path (label canonicalization, ordering,
    * line shape) is what the oracle pins down.
    */
  def exporterRender(s: SparkSession, dir: String): DataFrame = {
    val latest = EventQueries.events(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(max_by(col("value"), struct(col("ts"), col("event_id"))).as("v"))
      .select(lit("graft_latest").as("name"),
        map(lit("type"), col("event_type"), lit("user"), col("user_id").cast("string")).as("tags"),
        floor(col("v")).cast("double").as("value"))
    graft.functions.Exporter.renderText(latest)
  }

  /** Ladder for q63 — the top rung (250) sits BELOW max(value) (~490) so the
    * rank-above-last-rung fallback (return the highest finite bound, the
    * PromQL rule) is exercised deterministically at every SF.
    */
  private val HistLadder = Array(1.0, 2.5, 5.0, 10.0, 25.0, 50.0, 100.0, 250.0)

  /** q63: `histogram_quantile` read over the histogram TIER path — raw events
    * → cumulative-bucket 1m histogram (TierRollup.histogramFromObs) → 1m→1h
    * tier merge (element-wise bucket add) → p50/p90/p99 interpolated from the
    * merged cumulative counts (TierRollup.histogramQuantile, pure generated
    * Catalyst arithmetic). The oracle replays bucketing, merge and
    * interpolation in SQL GENERATED FROM THE SAME LADDER, so the two rules
    * cannot drift. Everything downstream of the one rollup shuffle is
    * arithmetic on (count, bucket-count array) cells — integer counts and
    * ladder constants — so cross-engine float parity holds at round(·,4).
    */
  def histQuantile(s: SparkSession, dir: String): DataFrame = {
    import graft.tiers.TierRollup
    val h1m = TierRollup.histogramFromObs(EventQueries.obs(s, dir), HistLadder, 60L)
    val h1h = TierRollup.mergeHistogramTier(h1m, HistLadder.length, 3600L)
    h1h.select(col("series"), col("bucket"),
        col("h_count"),
        round(TierRollup.histogramQuantile(HistLadder, 0.50), 4).as("p50"),
        round(TierRollup.histogramQuantile(HistLadder, 0.90), 4).as("p90"),
        round(TierRollup.histogramQuantile(HistLadder, 0.99), 4).as("p99"))
      .orderBy(col("series"), col("bucket"))
  }

  /** DuckDB twin of [[histQuantile]]: cumulative counts via one
    * sum(CASE) per rung, interpolation via a CASE chain — both rendered from
    * [[HistLadder]] by [[histQuantileCase]]. */
  val histQuantileOracle: String = {
    val rungs = HistLadder.indices.map(i =>
      s"sum(CASE WHEN value <= ${HistLadder(i)} THEN 1 ELSE 0 END)::DOUBLE AS c$i")
      .mkString(",\n  ")
    s"""WITH h AS (
       |  SELECT event_type AS series,
       |    (floor(epoch(ts))::BIGINT // 3600) * 3600 AS bucket,
       |    count(*) AS h_count,
       |    $rungs
       |  FROM events GROUP BY 1, 2)
       |SELECT series, bucket, h_count,
       |  round(${histQuantileCase(0.50)}, 4) AS p50,
       |  round(${histQuantileCase(0.90)}, 4) AS p90,
       |  round(${histQuantileCase(0.99)}, 4) AS p99
       |FROM h ORDER BY series, bucket""".stripMargin
  }

  private def histQuantileCase(phi: Double): String = {
    val rank = s"($phi * h_count)"
    val whens = HistLadder.indices.map { i =>
      val c = s"c$i"
      val prevC = if (i == 0) "0.0" else s"c${i - 1}"
      val lower = if (i == 0) 0.0 else HistLadder(i - 1)
      s"WHEN $c >= $rank THEN $lower + (${HistLadder(i)} - $lower) * ($rank - $prevC) / ($c - $prevC)"
    }.mkString(" ")
    s"(CASE $whens ELSE ${HistLadder.last} END)"
  }

  /** q61: SimHash banding, provable-recall slice (the q28/q52 pattern applied
    * to the one remaining hash-bound dedup family): a deterministic clone of
    * every 40th doc (id+10⁷) is unioned in; identical text ⇒ identical 64-bit
    * SimHash ⇒ every band key equal ⇒ guaranteed candidate (recall exactly
    * 1.0 while any of the 4 bucket copies survives the maxBucket guard, sized
    * far above any identical-text group here); candidates are then VERIFIED
    * by exact text equality — the verify stage a production near-dup pass
    * runs anyway — so the output is exactly the identical-text pair set and
    * DuckDB's text-equality self-join is an exact oracle. The graded
    * hamming<=3 mode stays q29 (rows) + brute-force ScalaTest.
    */
  def simhashClones(s: SparkSession, dir: String): DataFrame = {
    val d = DocQueries.documents(s, dir)
    val clones = d.filter(pmod(col("doc_id"), lit(40)) === 0)
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
    val u = d.unionByName(clones)
    val pairs = Dedup.simhashPairs(u, "doc_id", "text", maxHamming = 0, maxBucket = 1024)
    val t = u.select(col("doc_id"), col("text"))
    pairs
      .join(t.select(col("doc_id").as("doc_a"), col("text").as("_ta")), "doc_a")
      .join(t.select(col("doc_id").as("doc_b"), col("text").as("_tb")), "doc_b")
      .filter(col("_ta") === col("_tb"))
      .select(col("doc_a"), col("doc_b"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** n planted clones of the (single-row) query frame at ids 10⁷+1..n as ONE
    * explode branch (round 6) — the per-id `withColumn(lit).union` chain
    * scanned and planned the q0 filter once per clone; same row multiset.
    */
  private def cloneIds(q0: DataFrame, n: Int): DataFrame =
    q0.select(explode(sequence(lit(1L), lit(n.toLong))).as("_i"), col("*"))
      .withColumn("vec_id", lit(10000000L) + col("_i"))
      .drop("_i")

  /** q62: ANN LSH probe retrieval, provable slice: 5 exact clones of the
    * query vector (vec_id 0) are planted at ids 10⁷+1..5; an identical vector
    * has an identical hyperplane-sign bucket, so the single-probe search MUST
    * surface every clone at cosine 1.0 (the top of the ranking; ties break by
    * id). The top-k output is then pinned to the provable slice by exact
    * embedding equality, making DuckDB's embedding-equality scan an exact
    * oracle for the index's retrieval path. The graded top-k modes stay
    * q30/q46 (rows) + recall-monotonicity ScalaTest.
    */
  def annLshClones(s: SparkSession, dir: String): DataFrame = {
    val e = DocQueries.embeddings(s, dir)
    val q0 = e.filter(col("vec_id") === 0L)
    val clones = cloneIds(q0, 5)
    val u = e.unionByName(clones)
    val hits = Similarity.lshTopK(u, "vec_id", "embedding", queryId = 0L, k = 16)
    hits.join(u.select(col("vec_id"), col("embedding")), "vec_id")
      .crossJoin(broadcast(q0.select(col("embedding").as("_qe"))))
      .filter(col("embedding") === col("_qe"))
      .select(col("vec_id"))
      .orderBy(col("vec_id"))
  }

  /** q77: multi-probe ANN retrieval, provable slice (the q62 pattern for the
    * MULTI-probe path): the same 5 planted exact clones of query vector 0
    * sit in the query's own bucket (Hamming distance 0), so EVERY probe set
    * — Hamming radius 0, 1 and 2 — must retrieve all of them at cosine 1.0.
    * Each radius' top-k is pinned to the provable slice by exact embedding
    * equality; the oracle is the clone list crossed with the radii. A radius
    * that failed to probe the exact bucket (the retrieval bug this guards)
    * would drop its 6 rows.
    */
  def annMultiProbeClones(s: SparkSession, dir: String): DataFrame = {
    val e = DocQueries.embeddings(s, dir)
    val q0 = e.filter(col("vec_id") === 0L)
    val clones = cloneIds(q0, 5)
    val u = e.unionByName(clones)
    (0 to 2).map { h =>
      Similarity.lshTopKMultiProbe(u, "vec_id", "embedding", queryId = 0L,
          k = 16, probeHamming = h)
        .join(u.select(col("vec_id"), col("embedding")), "vec_id")
        .crossJoin(broadcast(q0.select(col("embedding").as("_qe"))))
        .filter(col("embedding") === col("_qe"))
        .select(lit(h.toLong).as("probe_hamming"), col("vec_id"))
    }.reduce(_ unionByName _).orderBy(col("probe_hamming"), col("vec_id"))
  }

  /** q80: a compiled MULTI-STATEMENT VTL program (SURVEY §2.7 statement
    * surface — lib/vtl/src/compiler/statement.rs:13-80) exercising the full
    * statement set end-to-end: chained assignment, if / else-if merge,
    * `for k, v in map` with `continue`, and a final `return` (`del` and
    * `break` ride VtlProgramSpec). The whole 7-statement program compiles to
    * ONE Project over the events scan (VtlProgramSpec asserts the node
    * count); the oracle replays the same program as plain SQL expressions.
    */
  def vtlProgram(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VtlProgram._
    val program = Seq[Stmt](
      // if value >= 150 { sev = "high" } else if value >= 50 { sev = "mid" }
      //   else { sev = "low" }
      If(env => ref(env, "value") >= 150.0,
        Seq(Assign("sev", _ => lit("high"))),
        Seq(If(env => ref(env, "value") >= 50.0,
          Seq(Assign("sev", _ => lit("mid"))),
          Seq(Assign("sev", _ => lit("low")))))),
      // tags = {"type": event_type, "tmp_debug": props, "uid": str(user_id)}
      Assign("tags", env => map(
        lit("type"), ref(env, "event_type"),
        lit("tmp_debug"), ref(env, "props"),
        lit("uid"), ref(env, "user_id").cast("string"))),
      // for k, v in tags { if starts_with(k, "tmp_") { continue }
      //   tags["t_" + k] = uppercase(v) }
      ForKV("tags", ref(_, "tags"),
        ForBody(
          continueWhen = Some((k, _) => k.startsWith("tmp_")),
          yieldKey = (k, _) => concat(lit("t_"), k),
          yieldValue = (_, v) => upper(v))),
      // k_val = to_integer(parse_json(props).k)
      Assign("k_val", env => get_json_object(ref(env, "props"), "$.k").cast("int")),
      // if sev == "high" { alert = k_val % 2 == 0 } else { alert = false }
      If(env => ref(env, "sev") === "high",
        Seq(Assign("alert", env => ref(env, "k_val") % 2 === 0)),
        Seq(Assign("alert", _ => lit(false)))),
      // tags_str = canonical render (sorted k=v pairs) — keeps the oracle
      // comparable without map-typed output
      Assign("tags_str", env => array_join(transform(
        array_sort(map_entries(ref(env, "tags"))),
        e => concat(e("key"), lit("="), e("value"))), ",")),
      Return(Seq("event_id", "sev", "alert", "tags_str")))
    compile(EventQueries.events(s, dir), program).orderBy(col("event_id"))
  }

  /** q80 oracle: the statement program replayed as SQL — same CASE merge,
    * same loop result (tmp_ dropped, keys prefixed t_, values uppercased,
    * sorted render), same json parse and modulo.
    */
  val vtlProgramOracle: String =
    """SELECT event_id,
      |  CASE WHEN value >= 150 THEN 'high'
      |       WHEN value >= 50 THEN 'mid' ELSE 'low' END AS sev,
      |  CASE WHEN value >= 150
      |       THEN (CAST(json_extract_string(props, '$.k') AS INTEGER) % 2 = 0)
      |       ELSE false END AS alert,
      |  't_type=' || upper(event_type) || ',t_uid=' || CAST(user_id AS VARCHAR)
      |    AS tags_str
      |FROM events ORDER BY event_id""".stripMargin
}
