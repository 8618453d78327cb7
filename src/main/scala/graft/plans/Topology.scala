package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative topology → DataFrame DAG (SURVEY.md §1.5/§3.1).
  *
  * The reference's user interface is a config DAG: `sources`/`transforms`/
  * `sinks` with `inputs: [..]` edges, validated before execution
  * (/root/reference/lib/framework/src/config/loading/graph.rs:36-96) and then
  * built into tasks (/root/reference/lib/framework/src/topology/builder.rs:31-39).
  * Here a component list compiles to named DataFrames: validation = unknown
  * input / duplicate id / cycle detection; execution = Catalyst (analysis
  * replaces the reference's Log/Metric/Trace type masks).
  *
  * Multiple inputs union (fanout.rs merge semantics); `Route` exposes named
  * output ports addressed as "id.port" with non-exclusive matching and an
  * `_unmatched` port, exactly like the reference route transform
  * (/root/reference/src/transforms/route.rs:52-91).
  */
object Topology {

  sealed trait Component { def id: String; def inputs: Seq[String] }
  final case class SourceParquet(id: String, path: String) extends Component {
    val inputs: Seq[String] = Nil
  }
  /** filter transform: keep rows where the SQL boolean expression holds. */
  final case class Filter(id: String, inputs: Seq[String], condition: String) extends Component
  /** rewrite transform: a chain of (column := SQL expression) assignments. */
  final case class Rewrite(id: String, inputs: Seq[String], exprs: Seq[(String, String)])
      extends Component
  /** route transform: named boolean ports (non-exclusive) + _unmatched. */
  final case class Route(id: String, inputs: Seq[String], ports: Seq[(String, String)])
      extends Component
  /** grouped rollup: series/ts/value SQL expressions + bucket seconds. */
  /** seqExpr must be a deterministic unique tiebreak (e.g. an id column) for
    * "last" to be reproducible under repartitioning. */
  final case class Rollup(id: String, inputs: Seq[String], series: String, ts: String,
      value: String, bucketSec: Long, seqExpr: String) extends Component

  final case class TopologyException(msg: String) extends RuntimeException(msg)

  /** Validate and build: returns every component's output frame by id
    * (route ports as "id.port").
    */
  def build(spark: SparkSession, components: Seq[Component]): Map[String, DataFrame] = {
    val ids = components.map(_.id)
    ids.diff(ids.distinct).headOption.foreach(d => throw TopologyException(s"duplicate id: $d"))

    val portIds: Set[String] = components.flatMap {
      case r: Route => (r.ports.map(p => s"${r.id}.${p._1}") :+ s"${r.id}._unmatched")
      case c => Seq(c.id)
    }.toSet
    components.flatMap(_.inputs).foreach { in =>
      if (!portIds.contains(in) && !ids.contains(in))
        throw TopologyException(s"unknown input: $in")
    }

    var built = Map.empty[String, DataFrame]
    var remaining = components
    var progressed = true
    while (remaining.nonEmpty && progressed) {
      val (ready, blocked) = remaining.partition(_.inputs.forall(built.contains))
      progressed = ready.nonEmpty
      ready.foreach { c =>
        def merged: DataFrame = c.inputs.map(built).reduce(_ unionByName _)
        c match {
          case s: SourceParquet =>
            built += s.id -> spark.read.parquet(s.path)
          case f: Filter =>
            built += f.id -> merged.filter(expr(f.condition))
          case r: Rewrite =>
            built += r.id -> r.exprs.foldLeft(merged) { case (df, (name, e)) =>
              df.withColumn(name, expr(e))
            }
          case r: Route =>
            val parent = merged
            var unmatchedCond = lit(true)
            r.ports.foreach { case (port, cond) =>
              built += s"${r.id}.$port" -> parent.filter(expr(cond))
              unmatchedCond = unmatchedCond && !coalesce(expr(cond), lit(false))
            }
            built += s"${r.id}._unmatched" -> parent.filter(unmatchedCond)
            built += r.id -> parent // bare id = passthrough of the parent
          case r: Rollup =>
            val obs = merged.select(expr(r.series).as("series"), expr(r.ts).as("ts"),
              expr(r.seqExpr).as("seq"), expr(r.value).as("value"))
            built += r.id -> graft.tiers.TierRollup.fromObs(obs, r.bucketSec)
        }
      }
      remaining = blocked
    }
    if (remaining.nonEmpty)
      throw TopologyException(
        s"cycle or unresolved inputs: ${remaining.map(_.id).mkString(", ")}")
    built
  }
}
