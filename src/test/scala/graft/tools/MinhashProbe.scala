package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev probe: where q28's wall goes — signature pass vs bucket groupBy vs
  * audit census vs candidate generation vs the verify join.
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d0 = graft.queries.DocQueries.documents(spark, sfDir)
    val clones = d0.filter(pmod(col("doc_id"), lit(50)) === 0)
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
    val d = d0.unionByName(clones)
    println(s"docs: ${d.count()}")
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warm: shingle hashes count") {
      d.select(Dedup.shingleHashes(col("text")).as("sh")).agg(sum(size(col("sh")))).head()
    }
    time("shingle hashes only") {
      d.select(Dedup.shingleHashes(col("text")).as("sh")).agg(sum(size(col("sh")))).head()
    }
    time("signatures") {
      d.select(Dedup.minhashSignatureFromHashes(Dedup.shingleHashes(col("text"))).as("sig"))
        .agg(sum(size(col("sig")))).head()
    }
    time("buckets (sig + band groupBy)") {
      Dedup.minhashBuckets(d, "doc_id", "text").agg(count(lit(1))).head()
    }
    time("audit census (droppedBuckets agg)") {
      Dedup.droppedBuckets(Dedup.minhashBuckets(d, "doc_id", "text"), 256)
        .agg(count(lit(1)), coalesce(sum(col("bucket_size")), lit(0L))).head()
    }
    time("candidates") {
      Dedup.minhashCandidates(d, "doc_id", "text", maxBucket = 256).agg(count(lit(1))).head()
    }
    time("full minhashDedup (q28 body)") {
      Dedup.minhashDedup(d, "doc_id", "text", threshold = 1.0, maxBucket = 256)
        .agg(count(lit(1))).head()
    }
    spark.stop()
  }
}
