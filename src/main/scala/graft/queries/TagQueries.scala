package graft.queries

import graft.functions.TagOps
import graft.functions.TagOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tag-map metric-model queries: the reference's metric identity is
  * {name, tags} (/root/reference/lib/event/src/metric/mod.rs:67-71) and the
  * relabel transform is an ordered op list over the tags map
  * (/root/reference/src/transforms/relabel.rs:15-134). These queries exercise
  * the MapType tag model end-to-end with DuckDB oracles (maps are compared
  * via their canonical sorted "k=v" string).
  */
object TagQueries {

  /** q38: all 9 relabel ops chained over a real tags map built from events,
    * grouped by the resulting canonical series identity. Whole chain is one
    * codegen'd projection; the only shuffle is the final groupBy.
    */
  def relabelTags(s: SparkSession, dir: String): DataFrame = {
    val e = EventQueries.events(s, dir)
    val tagged = e.withColumn("tags", map(
      lit("type"), col("event_type"),
      lit("user"), col("user_id").cast("string"),
      lit("tmp"), lit("x"),
      lit("env"), lit("PROD")))
    val ops = Seq(
      LowercaseTag("env"), // PROD -> prod
      RenameTag("type", "kind"), // type=<event_type> -> kind=<event_type>
      HashModTag("user", Some("shard"), 7), // shard = md5(user)[8..16] % 7
      DeleteTag("tmp"),
      AddTag("region", lit("eu")), // absent -> added
      AddTag("env", lit("ignored")), // present -> no-op
      SetTag("app", lit("graft")),
      DropTags("^u.*"), // drops "user"
      KeepTags("^(kind|shard|env|region|app)$"))
    tagged
      .withColumn("rt", TagOps.applyOps(col("tags"), ops))
      .groupBy(TagOps.canonicalTags(col("rt")).as("series"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("series"))
  }

  /** q38 oracle: the same op chain expressed as a DuckDB string build —
    * sorted key order app,env,kind,region,shard; hashMod via md5 hex 17..32
    * as unsigned 64-bit.
    */
  val relabelTagsOracle: String =
    """SELECT 'app=graft,env=prod,kind=' || event_type || ',region=eu,shard=' ||
      |  (('0x' || substring(md5(user_id::VARCHAR), 17, 16))::UBIGINT % 7)::VARCHAR AS series,
      |  count(*) AS cnt
      |FROM events GROUP BY 1 ORDER BY series""".stripMargin
}
