package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev probe: scan every SparkEntry query's physical plan for WindowExec
  * nodes with an EMPTY partition spec (the "No Partition Defined" warning —
  * a single-task global window, the scale-killer shape). Prints one line per
  * offending query with the window's order spec.
  *
  *   sbt "Test/runMain graft.tools.GlobalWindowProbe /root/testdata/sf0.001"
  */
object GlobalWindowProbe {
  private def globalWindows(p: SparkPlan): Seq[WindowExec] = {
    val self = p match {
      case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
      case _ => Seq.empty
    }
    val kids = p.children.flatMap(globalWindows) ++ (p match {
      case a: AdaptiveSparkPlanExec => globalWindows(a.executedPlan)
      case _ => Seq.empty
    })
    self ++ kids ++ p.subqueries.flatMap(globalWindows)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .appName("global-window-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var hits = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val gw = globalWindows(df.queryExecution.executedPlan)
        if (gw.nonEmpty) {
          hits += gw.size
          gw.foreach(w => println(
            s"GLOBAL_WINDOW $name order=${w.orderSpec.mkString(",").take(120)}"))
        }
      } catch {
        case e: Exception => println(s"GLOBAL_WINDOW_ERR $name ${e.getClass.getSimpleName}")
      }
    }
    println(s"GLOBAL_WINDOW_TOTAL $hits")
    spark.stop()
  }
}
