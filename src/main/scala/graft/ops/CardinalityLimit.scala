package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cardinality limiter enforcement actions
  * (/root/reference/src/transforms/cardinality.rs:240-292): per tag KEY the
  * first `limit` distinct values (in arrival order) are accepted; an event
  * carrying a rejected value is either dropped whole (`Drop` — the q23
  * query) or keeps flowing with just the offending tag stripped (`DropTag` —
  * the less destructive mode implemented here).
  *
  * Batch determinism: "arrival order" is the first-seen `ordCol` per value
  * (the reference's accepted set is insertion-ordered by stream arrival).
  *
  * Scale shape: the accepted set is discovered with a hash groupBy + a
  * distributed TakeOrdered (orderBy(firstSeen).limit(limit)) — never a
  * global window — and is limit-bounded by construction, so collecting it to
  * the driver mirrors the reference's in-memory `HashSet` exactly. The set is
  * shipped as a `SparkContext.broadcast` hash set probed by one O(1) UDF call
  * per row (no join, no shuffle on the data) — NOT as a limit-sized literal
  * array in the plan: at the reference's real limits (10⁴–10⁵ distinct
  * values) an `array_contains(array(lit×limit), v)` is a linear scan per row
  * and a plan-sized payload the driver re-serializes into every task binary.
  */
object CardinalityLimit {

  /** First `limit` distinct values of tag `key` by first-seen `ordCol`:
    * (value, first_ord) rows, at most `limit` of them. The secondary sort on
    * `value` makes the limit boundary deterministic when two distinct values
    * share a first-seen ord (possible whenever `ordCol` isn't unique per
    * event).
    */
  def acceptedValues(df: DataFrame, tagsCol: String, key: String, ordCol: Column,
      limit: Int): DataFrame =
    df.select(element_at(col(tagsCol), key).as("value"), ordCol.as("_ord"))
      .filter(col("value").isNotNull)
      .groupBy(col("value"))
      .agg(min(col("_ord")).as("first_ord"))
      .orderBy(col("first_ord"), col("value"))
      .limit(limit)

  /** The broadcast accepted set + its membership probe (shared by both
    * enforcement actions). An empty set (no event carries the key, or empty
    * input) is a valid broadcast: every probe misses, so DropTag strips the
    * key everywhere and Drop keeps only keyless events — the reference's
    * behavior with an empty accepted map.
    */
  private def acceptedProbe(df: DataFrame, tagsCol: String, key: String,
      ordCol: Column, limit: Int): Column => Column = {
    val accepted = acceptedValues(df, tagsCol, key, ordCol, limit)
      .select(col("value")).collect().map(_.getString(0)).toSet
    val bc = df.sparkSession.sparkContext.broadcast(accepted)
    val probe = udf { (v: String) => v != null && bc.value.contains(v) }
    probe.apply(_)
  }

  /** DropTag enforcement: events keep flowing; tag `key` is removed from
    * events whose value wasn't among the first `limit` distinct values.
    */
  def dropTag(df: DataFrame, tagsCol: String, key: String, ordCol: Column,
      limit: Int): DataFrame = {
    val ok = acceptedProbe(df, tagsCol, key, ordCol, limit)
    val v = element_at(col(tagsCol), key)
    // the UDF probes the scalar value once per row; the map rebuild is a
    // lambda over plain columns (UDFs can't reference lambda variables)
    df.withColumn(tagsCol,
      when(v.isNull || ok(v), col(tagsCol))
        .otherwise(map_filter(col(tagsCol), (k, _) => k =!= key)))
  }

  /** Drop enforcement (the reference's other action, for symmetry): events
    * whose `key` value is rejected are dropped entirely.
    */
  def dropEvent(df: DataFrame, tagsCol: String, key: String, ordCol: Column,
      limit: Int): DataFrame = {
    val ok = acceptedProbe(df, tagsCol, key, ordCol, limit)
    val v = element_at(col(tagsCol), key)
    df.filter(v.isNull || ok(v))
  }
}
