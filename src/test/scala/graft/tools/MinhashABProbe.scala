package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev probe: isolate where the q28 bucket pass spends — exploded band rows
  * (sig × 16 structs + Generate) vs the collect_list groupBy on top.
  */
object MinhashABProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.queries.DocQueries.documents(spark, sfDir)
    d.count()
    def time3(tag: String)(f: => Any): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[$tag] min=${ts.min}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time3("sig only") {
      d.select(Dedup.minhashSignatureFromHashes(Dedup.shingleHashes(col("text"))).as("sig"))
        .agg(sum(size(col("sig")))).head()
    }
    val exploded = d
      .select(col("doc_id").as("doc"), Dedup.shingleHashes(col("text")).as("_sh"))
      .select(col("doc"), Dedup.minhashSignatureFromHashes(col("_sh"), 64).as("_sig"))
      .select(col("doc"), Dedup.bandKeys(col("_sig"), 16, 4).as("bk"))
      .select(col("doc"), explode(col("bk")).as("b"))
    time3("exploded band rows (no groupBy)") {
      exploded.agg(max(col("b.key")), count(lit(1))).head()
    }
    time3("full buckets") {
      Dedup.minhashBuckets(d, "doc_id", "text").agg(count(lit(1))).head()
    }
  }
}
