package graft.tiers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.4): for every left row, attach the latest right
  * row with rightTs <= leftTs within the same key — the temporal lookup the
  * north rule requires for gap-fill and enrichment. Spark has no native as-of
  * join; this composes built-ins via the union + ordered-window LOCF pattern:
  *
  *   union(left tagged probe, right tagged build)
  *     → window per key ordered by (ts, side) → last(build cols, ignoreNulls)
  *     → keep probe rows
  *
  * One shuffle (the window partitioning), no join explosion, no range-join
  * quadratic blowup — the standard scalable formulation. Backward-looking
  * (<=); strictness is handled by ordering build rows before probe rows at
  * equal ts.
  */
object AsOfJoin {

  /** @param left     probe side; must contain keyCols + leftTs
    * @param right    build side; must contain keyCols + rightTs + value cols
    * @param keyCols  equality keys
    * @param leftTs   probe event-time column name (long/timestamp, orderable)
    * @param rightTs  build event-time column name
    * @param valueCols right columns to carry (renamed as-is onto the output)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]): DataFrame = {
    val probe = left
      .withColumn("_t", col(leftTs).cast("long"))
      .withColumn("_side", lit(1)) // probe sorts after build at equal ts (<= semantics)
      .withColumns(valueCols.map(v => v -> lit(null).cast(right.schema(v).dataType)).toMap)
    val build = right
      .withColumn("_t", col(rightTs).cast("long"))
      .withColumn("_side", lit(0))
    val buildProjected = build.select(
      (keyCols.map(col) :+ col("_t") :+ col("_side")) ++ valueCols.map(col): _*)
    val probeProjected = probe.select(
      (keyCols.map(col) :+ col("_t") :+ col("_side")) ++ valueCols.map(col) ++
        left.columns.filterNot(c => keyCols.contains(c)).map(c => col(c).as(s"_l_$c")): _*)

    val unioned = probeProjected.unionByName(
      buildProjected.withColumns(
        left.columns.filterNot(keyCols.contains).map(c => s"_l_$c" ->
          lit(null).cast(left.schema(c).dataType)).toMap))

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = valueCols.foldLeft(unioned) { (df, v) =>
      df.withColumn(v, last(when(col("_side") === 0, col(v)), ignoreNulls = true).over(w))
    }
    filled
      .filter(col("_side") === 1)
      .select(keyCols.map(col) ++
        left.columns.filterNot(keyCols.contains).map(c => col(s"_l_$c").as(c)) ++
        valueCols.map(col): _*)
  }
}
