package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time the components of q38/q39/q40 (the heaviest round-2
  * queries) to locate where the wall time goes before optimizing.
  */
object Q38Probe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    // warm
    queries.TagQueries.relabelTags(s, dir).write.format("noop").mode("overwrite").save()
    time("q38 full") {
      queries.TagQueries.relabelTags(s, dir).write.format("noop").mode("overwrite").save(); 1L
    }
    val e = queries.EventQueries.events(s, dir)
    time("baseline groupBy(type, user%7)") {
      e.groupBy(col("event_type"), pmod(col("user_id"), lit(7))).count().count()
    }
    time("hashMod only") {
      e.select(functions.Vtl.hashMod(col("user_id").cast("string"), 7).as("h"))
        .groupBy(col("h")).count().count()
    }
    time("tag chain, no canonical groupBy") {
      val tagged = e.withColumn("tags", map(
        lit("type"), col("event_type"), lit("user"), col("user_id").cast("string"),
        lit("tmp"), lit("x"), lit("env"), lit("PROD")))
      import functions.TagOps._
      val ops = Seq(LowercaseTag("env"), RenameTag("type", "kind"),
        HashModTag("user", Some("shard"), 7), DeleteTag("tmp"),
        AddTag("region", lit("eu")), AddTag("env", lit("ignored")),
        SetTag("app", lit("graft")), DropTags("^u.*"),
        KeepTags("^(kind|shard|env|region|app)$"))
      tagged.select(functions.TagOps.applyOps(col("tags"), ops).as("rt"))
        .select(count(map_keys(col("rt"))(0))).head().getLong(0)
    }
    time("canonicalTags only") {
      val tagged = e.select(map(lit("type"), col("event_type"),
        lit("user"), col("user_id").cast("string")).as("tags"))
      tagged.select(functions.TagOps.canonicalTags(col("tags")).as("c"))
        .groupBy(col("c")).count().count()
    }
    queries.TagQueries.relabelTags(s, dir).explain("formatted")
    s.stop()
  }
}
