package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected-component resolution over a near-duplicate pair frame — the step
  * a training-corpus dedup pipeline needs AFTER pair generation (minhash /
  * simhash / cosine banding emit pairs; keeping one doc per duplicate *group*
  * requires the transitive closure of those pairs). The reference's dedup
  * transform (/root/reference/src/transforms/dedup.rs) is per-event identity
  * grouping and has no transitive form; this operator extends the repo's dedup
  * family (Dedup/DedupFields/Similarity) to group resolution.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", ACM SoCC'14) — the published
  * MapReduce-scale formulation. Each half-round is one shuffle-bounded
  * groupBy + join over the edge set; the edge set only ever shrinks toward
  * star graphs rooted at each component's minimum id, and the round count is
  * O(log n) in the worst case (duplicate clusters in practice converge in
  * 2-3 rounds). No step ever materializes a component in one task: memory per
  * task is bounded by the shuffle partition, so the operator survives
  * components of any size — the property a 100 TB dedup graph needs and a
  * driver-side union-find cannot give.
  *
  * Iteration safety: every round's edge frame is eagerly checkpointed —
  * reliably when `spark.sparkContext.setCheckpointDir` is configured (the
  * right choice on a real cluster, where a lost executor must not force a
  * full recompute chain) and via `localCheckpoint` otherwise — so lineage
  * never grows across rounds. Convergence = identical (count, hash-sum)
  * signature on two
  * consecutive rounds; the signature is one tiny aggregate per round, which is
  * the standard price of the iterative algorithm.
  */
object Cluster {

  /** Resolve connected components of the undirected graph given by
    * `pairs(aCol, bCol)` (long ids; self-pairs and duplicate pairs are
    * normalized away). Returns (`node`, `cluster`) with one row per distinct
    * id appearing in any pair and `cluster` = the minimum id of the node's
    * component. Nodes with no surviving edge (only self-pairs) do not appear;
    * callers wanting singleton rows union them in.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    val reliable = spark.sparkContext.getCheckpointDir.isDefined

    def truncate(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(true) else df.localCheckpoint(true)

    // normalize: undirected edge set as (s < d), no self-loops, deduped
    val init = pairs
      .select(least(col(aCol), col(bCol)).cast("long").as("s"),
        greatest(col(aCol), col(bCol)).cast("long").as("d"))
      .where(col("s") =!= col("d") && col("s").isNotNull && col("d").isNotNull)
      .distinct()

    // per-node neighborhood minimum as ONE window over the star key (round
    // 6): the groupBy(min) + equi-join-back form shuffled the edge frame
    // TWICE per half-round (once into the aggregate, once into the join);
    // the window computes the same m(u) with a single exchange. Skew is
    // unchanged — the join also colocated every edge of a hot node on one
    // partition — and the window partitions by the full-cardinality node
    // key, never globally (the GlobalWindowSpec guard covers q59).
    val wNode = org.apache.spark.sql.expressions.Window.partitionBy(col("s"))

    // large-star: every node u links its LARGER neighbors to m(u) = min(Γ⁺(u)).
    // NO intermediate distinct (round 6): within a round the large-star
    // output feeds only small-star, whose min is duplicate-insensitive and
    // whose own distinct() dedupes the round's result — the edge SET
    // evolves identically, and the removed exchange was a full shuffle of
    // the edge frame per round. Duplicate inflation is bounded: large-star
    // emits at most |sym| rows regardless.
    def largeStar(e: DataFrame): DataFrame =
      e.select(col("s"), col("d"))
        .union(e.select(col("d").as("s"), col("s").as("d")))
        .withColumn("mn", min(col("d")).over(wNode))
        .where(col("d") > col("s"))
        .select(col("d").as("s"), least(col("s"), col("mn")).as("d"))
        .where(col("s") =!= col("d"))

    // small-star: every node u links its smaller neighbors AND itself to
    // m(u) = min of those neighbors (all < u after orienting large→small)
    def smallStar(e: DataFrame): DataFrame =
      e.select(greatest(col("s"), col("d")).as("s"),
        least(col("s"), col("d")).as("d"))
        .withColumn("mn", min(col("d")).over(wNode))
        // one pass (no self-union → no double compute):
        // (u, m) re-links u itself; (v, m) re-links each smaller neighbor
        .select(explode(array(
          struct(col("s").as("s"), col("mn").as("d")),
          struct(col("d").as("s"), col("mn").as("d")))).as("e"))
        .select(col("e.s").as("s"), col("e.d").as("d"))
        .where(col("s") =!= col("d"))
        .distinct()

    // (row count, hash xor) — one small aggregate; equality on consecutive
    // rounds is the fixpoint test. bit_xor never overflows (ANSI-safe) and is
    // duplicate-free-set safe here because the edge frame is distinct();
    // collision odds are ~2^-64 and the q59 oracle + union-find spec guard
    // the end-to-end result
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("s"), col("d"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    // checkpoint(true)/localCheckpoint(true) are EAGER: each round's frame is
    // materialized once and re-read from storage on every reference — no
    // re-derivation, no growing lineage; freed by the ContextCleaner when the
    // loop drops its reference
    var edges = truncate(init)
    var sig = signature(edges)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // ONE materialization per round (round 6): the large-star and
      // small-star halves compose into a single ~6-shuffle plan cut once at
      // the round boundary — the inner checkpoint bought nothing (the round
      // plan is shallow and bounded) and cost a full extra materialize +
      // re-read per round, half of the operator's fixed job count at
      // convergence-sized frames. Lineage still never crosses a round.
      val next = truncate(smallStar(largeStar(edges)))
      val nextSig = signature(next)
      converged = nextSig == sig
      edges = next
      sig = nextSig
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds (last signature $sig)")

    // fixpoint = stars rooted at component minima: each edge is (node, root)
    val labels = edges.select(col("s").as("node"), col("d").as("cluster"))
      .union(edges.select(col("d").as("node"), col("d").as("cluster")))
      .groupBy("node").agg(min(col("cluster")).as("cluster"))
    labels
  }
}
