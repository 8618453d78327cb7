package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: dump named SparkEntry queries to parquet at the driver's
  * oracle scale (sf0.01) so a DuckDB diff can replay the correctness gate
  * locally before a round ships. Usage:
  *   sbt "Test/runMain graft.tools.OracleProbe q80_vtl_program"
  * then compare /tmp/oracle_probe/<name>.parquet against the oracle SQL.
  */
object OracleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    require(args.nonEmpty, "pass query names")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").parquet(s"/tmp/oracle_probe/$n.parquet")
      println(s"ORACLE_PROBE wrote /tmp/oracle_probe/$n.parquet")
    }
    spark.stop()
  }
}
