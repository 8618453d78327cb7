package graft.jobs

import graft.lake.LakeTable
import graft.ops.Pack
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entrypoint for RESUMABLE sequence packing into the lake
  * (north_rule: jobs run via spark-submit, per-partition lineage manifests,
  * any rebuild resumable from the last committed checkpoint):
  *
  *   spark-submit --class graft.jobs.PackJobMain vertexspark.jar \
  *     <rawTokenTableDir> <lakeBase> [budget=2048] [chunkSeqs=1024]
  *
  * Reads the token table (input_hint shape: doc_id string, tokens array<int>,
  * n_tok int, source string), orders documents by the deterministic 60-bit
  * md5 of doc_id (the training-order shuffle, doc_id tie-break), packs
  * tokens into budget-sized sequences per source (Pack.packSequences — the
  * two-phase distributed prefix sum), and commits them to the lake
  * partitioned by (source, seq-chunk) with one lineage manifest per
  * partition. The packed layout is a pure function of the input, so a
  * re-submit after a mid-job failure recomputes only uncommitted partitions
  * and reproduces identical bytes (LakeTable.append resume contract).
  *
  * No master/config is hard-coded: spark-submit supplies the cluster (the
  * local[] default below applies only when launched directly).
  */
object PackJobMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: PackJobMain <rawDir> <lakeBase> [budget] [chunkSeqs]")
    val rawDir = args(0)
    val lakeBase = args(1)
    val budget = if (args.length > 2) args(2).toLong else 2048L
    val chunkSeqs = if (args.length > 3) args(3).toLong else 1024L
    require(budget > 0 && chunkSeqs > 0,
      s"budget=$budget and chunkSeqs=$chunkSeqs must be positive")

    val builder = SparkSession.builder()
      .appName("graft-pack-sequences")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(rawDir)
      .select(col("doc_id"), col("source"), col("tokens"),
        Pack.md5Rank60(col("doc_id")).as("_ord"))
    val packed = Pack.packSequences(docs, "source", "_ord", "tokens", budget,
        tieCol = Some("doc_id"))
      .withColumn("pk",
        concat(col("source"), lit("_"), expr(s"seq_id div $chunkSeqs")))

    val lake = new LakeTable(spark, lakeBase, s"packed_$budget", "pk")
    val newParts = lake.append(packed, lineage = s"pack budget=$budget raw=$rawDir")
    println(s"[pack] new=${newParts.size} " +
      s"committed=${lake.committedPartitions().size}")
    spark.stop()
  }
}
