package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

object MinhashPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.queries.DocQueries.documents(spark, "/root/testdata/sf0.01")
    val plan = Dedup.minhashBuckets(d, "doc_id", "text").queryExecution.executedPlan.toString
    val nSig = "graft_minhash_sig".r.findAllIn(plan).size
    val nHash = "xxhash64".r.findAllIn(plan).size
    println(s"SIG_OCCURRENCES=$nSig XXHASH_OCCURRENCES=$nHash")
    println(plan.take(6000))
  }
}
