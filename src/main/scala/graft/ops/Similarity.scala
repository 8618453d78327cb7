package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (builder-prompt first-class op):
  * brute-force cosine top-k as the exact baseline and a random-hyperplane
  * LSH-bucketed variant as the scale path (Charikar, STOC'02; IVF-style
  * candidate restriction).
  *
  * Scale design: the query vector is a broadcast single row; brute force is a
  * narrow map + top-k (no shuffle except the final limit); the LSH variant
  * restricts the exact distance computation to matching buckets, trading
  * recall for a ~2^bits candidate reduction.
  */
object Similarity {

  /** Σ aᵢbᵢ in double precision (deterministic sequential fold order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic random hyperplanes (seed fixed): nBits × dim in [-0.5, 0.5). */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rnd.nextDouble() - 0.5)
  }

  /** LSH bucket id: sign bit per hyperplane, packed into a long. */
  def lshBucket(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(emb, typedlit(p.toSeq)) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Exact brute-force top-k by cosine against one query vector (embedding of
    * `queryId`). The query row is collapsed to a broadcast literal-free
    * crossJoin of a 1-row frame.
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col(idCol) === queryId).select(col(vecCol).as("_q"))
    emb.crossJoin(broadcast(q))
      .select(col(idCol), round(cosine(col(vecCol), col("_q")), 5).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** LSH-bucketed approximate top-k: candidates share the query's bucket
    * (single-probe). Returns the same shape as bruteForceTopK plus the
    * candidate-set size for recall diagnostics.
    */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, nBits: Int = 8, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nBits, dim)
    val withBucket = emb.withColumn("_bucket", lshBucket(col(vecCol), planes))
    val q = withBucket.filter(col(idCol) === queryId)
      .select(col(vecCol).as("_q"), col("_bucket").as("_qb"))
    withBucket.crossJoin(broadcast(q))
      .filter(col("_bucket") === col("_qb"))
      .select(col(idCol), round(cosine(col(vecCol), col("_q")), 5).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Multi-probe LSH top-k: candidates live in the query's bucket OR any
    * bucket within hamming distance `probeHamming` of it (probing the
    * 1-bit-flip neighborhood is the standard recall fix for sign-LSH —
    * vectors near a hyperplane land on either side). Candidate volume grows
    * from 1 to 1 + nBits (+ nBits(nBits−1)/2 at hamming 2) buckets while the
    * scan stays one codegen'd filter — no shuffle, no bucket explosion.
    * Single-probe recall fell off with nBits (the round-1 noted limit);
    * multi-probe trades back candidate volume for recall with the SAME index.
    */
  def lshTopKMultiProbe(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, nBits: Int = 8, dim: Int = 64,
      probeHamming: Int = 1): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= 2, "probeHamming in [0, 2]")
    val planes = hyperplanes(nBits, dim)
    val withBucket = emb.withColumn("_bucket", lshBucket(col(vecCol), planes))
    val q = withBucket.filter(col(idCol) === queryId)
      .select(col(vecCol).as("_q"), col("_bucket").as("_qb"))
    withBucket.crossJoin(broadcast(q))
      .filter(bit_count(col("_bucket").bitwiseXOR(col("_qb"))) <= probeHamming)
      .select(col(idCol), round(cosine(col(vecCol), col("_q")), 5).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
