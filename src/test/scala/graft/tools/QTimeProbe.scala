package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time named SparkEntry queries on a given sf dir (defaults to
  * sf0.1, the bench scale) with one untimed warm pass for JIT/codegen. Usage:
  *   sbt "Test/runMain graft.tools.QTimeProbe q51_cosine_neardup q52_cosine_neardup_lsh"
  */
object QTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q51_cosine_neardup")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, sfDir).write.mode("overwrite").format("noop").save() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QTIME $n min=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
