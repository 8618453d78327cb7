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
  * the driver mirrors the reference's in-memory `HashSet` exactly and turns
  * enforcement into one codegen'd array_contains per row (no join, no
  * shuffle on the data).
  */
object CardinalityLimit {

  /** First `limit` distinct values of tag `key` by first-seen `ordCol`:
    * (value, first_ord) rows, at most `limit` of them.
    */
  def acceptedValues(df: DataFrame, tagsCol: String, key: String, ordCol: Column,
      limit: Int): DataFrame =
    df.select(element_at(col(tagsCol), key).as("value"), ordCol.as("_ord"))
      .filter(col("value").isNotNull)
      .groupBy(col("value"))
      .agg(min(col("_ord")).as("first_ord"))
      .orderBy(col("first_ord"))
      .limit(limit)

  /** DropTag enforcement: events keep flowing; tag `key` is removed from
    * events whose value wasn't among the first `limit` distinct values.
    */
  def dropTag(df: DataFrame, tagsCol: String, key: String, ordCol: Column,
      limit: Int): DataFrame = {
    val accepted = acceptedValues(df, tagsCol, key, ordCol, limit)
      .select(col("value")).collect().map(_.getString(0))
    val acceptedArr = array(accepted.toSeq.map(lit): _*)
    df.withColumn(tagsCol,
      map_filter(col(tagsCol), (k, v) =>
        k =!= key || array_contains(acceptedArr, v)))
  }

  /** Drop enforcement (the reference's other action, for symmetry): events
    * whose `key` value is rejected are dropped entirely.
    */
  def dropEvent(df: DataFrame, tagsCol: String, key: String, ordCol: Column,
      limit: Int): DataFrame = {
    val accepted = acceptedValues(df, tagsCol, key, ordCol, limit)
      .select(col("value")).collect().map(_.getString(0))
    val acceptedArr = array(accepted.toSeq.map(lit): _*)
    val v = element_at(col(tagsCol), key)
    df.filter(v.isNull || array_contains(acceptedArr, v))
  }
}
