package graft

import graft.functions.Metricalize
import graft.functions.Metricalize.MetricSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Path-driven metricalize semantics vs hand-replays of the reference's
  * state machine (/root/reference/src/transforms/metricalize.rs:67-120 value
  * and tag extraction; :233-248 kind-mismatch reset + failure count).
  */
class MetricalizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val logs = Seq(
    (1L, "a", """{"bytes": 10, "code": "200"}"""),
    (2L, "a", """{"bytes": 32, "code": "200"}"""),
    (3L, "a", """{"bytes": 7, "code": "500"}"""),
    (4L, "b", """{"bytes": 100}"""), // no code tag: tag omitted
    (5L, "b", """{"other": 1}""") // no bytes value: dropped + failure
  ).toDF("id", "host", "props")

  test("counter sums extracted values; tags from mixed json/column paths") {
    val out = Metricalize.metricalize(logs, "props",
      Seq(MetricSpec("bytes_total", "counter", "$.bytes",
        tagPaths = Map("host" -> "col:host", "code" -> "$.code"))),
      col("id"))
      .select($"tags", $"m_sum", $"m_count", $"mismatches")
      .as[(Map[String, String], Double, Long, Long)].collect().toSet
    assert(out == Set(
      (Map("host" -> "a", "code" -> "200"), 42.0, 2L, 0L),
      (Map("host" -> "a", "code" -> "500"), 7.0, 1L, 0L),
      (Map("host" -> "b"), 100.0, 1L, 0L))) // missing tag path omitted
  }

  test("counter with increment_by_value=false counts events") {
    val out = Metricalize.metricalize(logs, "props",
      Seq(MetricSpec("reqs", "counter", "$.bytes", incrementByValue = false)),
      col("id")).select($"m_sum", $"m_count").as[(Double, Long)].head()
    assert(out == ((4.0, 4L))) // row 5 has no bytes -> still dropped
  }

  test("gauge takes the last value in ord order; histogram builds the ladder") {
    val out = Metricalize.metricalize(logs, "props",
      Seq(
        MetricSpec("g", "gauge", "$.bytes"),
        MetricSpec("h", "histogram", "$.bytes", buckets = Seq(10.0, 50.0))),
      col("id"))
      .select($"name", $"m_sum", $"m_count", $"m_buckets")
      .as[(String, Double, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("g") == ((100.0, 4L, Seq.empty)))
    // bytes 10,32,7,100: <=10 -> {10,7}=2; <=50 -> {10,32,7}=3
    assert(out("h") == ((149.0, 4L, Seq(2L, 3L))))
  }

  test("kind mismatch resets state and is counted (metricalize.rs:233-248)") {
    // same series written counter,counter,gauge,counter in ord order:
    // transitions c->g and g->c = 2 mismatches; final kind=counter, and the
    // surviving run is only the rows after the LAST transition
    val rows = Seq((1L, 5.0, "counter"), (2L, 6.0, "counter"),
      (3L, 7.0, "gauge"), (4L, 8.0, "counter"), (5L, 9.0, "counter"))
      .toDF("id", "v", "k")
    // encode kinds via two specs and a value path that exists only for that kind
    val df = rows
      .withColumn("props", when($"k" === "counter",
        format_string("""{"c": %s}""", $"v")).otherwise(format_string("""{"g": %s}""", $"v")))
    val out = Metricalize.metricalize(df, "props",
      Seq(MetricSpec("m", "counter", "$.c"), MetricSpec("m", "gauge", "$.g")),
      col("id"))
      .select($"kind", $"m_sum", $"m_count", $"mismatches")
      .as[(String, Double, Long, Long)].head()
    assert(out == (("counter", 17.0, 2L, 2L))) // 8+9 survive; 2 flips
  }

  test("streaming metricalize: event-time window flush matches hand-computed state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, String)]
    val df = stream.toDF().toDF("ts", "seq", "props")
      .withColumn("ts_ts", timestamp_seconds(col("ts")))
    val out = Metricalize.metricalizeStream(df, "props",
      Seq(
        Metricalize.MetricSpec("b_total", "counter", "$.bytes"),
        Metricalize.MetricSpec("b_gauge", "gauge", "$.bytes")),
      "ts_ts", bucketSec = 60L, ordCol = col("seq"))
    val q = out.writeStream.format("memory").queryName("mz_out").outputMode("append").start()
    // window [0, 60): bytes 10, 30 (seq order 1, 2); window [60, 120): 5
    stream.addData(Seq((10L, 1L, """{"bytes": 10}"""), (20L, 2L, """{"bytes": 30}""")))
    stream.addData(Seq((70L, 3L, """{"bytes": 5}""")))
    // advance the watermark far enough to close both windows
    stream.addData(Seq((100000L, 4L, """{"bytes": 1}""")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("mz_out")
      .select($"bucket", $"name", $"m_sum", $"m_count")
      .as[(Long, String, Double, Long)].collect().toSet
    assert(got == Set(
      (0L, "b_total", 40.0, 2L), (0L, "b_gauge", 30.0, 2L),
      (60L, "b_total", 5.0, 1L), (60L, "b_gauge", 5.0, 1L)))
  }

  test("extraction failures are counted per spec") {
    val out = Metricalize.extractionFailures(logs, "props",
      Seq(MetricSpec("bytes_total", "counter", "$.bytes"),
        MetricSpec("codes", "counter", "$.code")))
      .as[(String, Long)].collect().toMap
    assert(out == Map("bytes_total" -> 1L, "codes" -> 2L)) // row5 no bytes; rows 4+5 no code
  }
}
