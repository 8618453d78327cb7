package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup transform field modes (/root/reference/src/transforms/dedup.rs:18-51):
  * `Match` keys on the listed fields, `Ignore` keys on their COMPLEMENT —
  * every column except the listed ones (the reference caches type+name+value
  * of all non-ignored fields, dedup.rs:101-120). First occurrence passes.
  *
  * Batch form: deterministic first-by-(ts, seq) per key via min_by, one
  * hash-shuffle on the key columns (the streaming form is
  * StreamRollup.dedupStream, state bounded by the watermark).
  */
object DedupFields {

  /** First occurrence per explicit key list (Match mode). */
  def dedupMatch(df: DataFrame, fields: Seq[String], tsCol: String, seqCol: String): DataFrame =
    firstPerKey(df, fields, tsCol, seqCol)

  /** First occurrence keyed on every column EXCEPT `ignore` (Ignore mode);
    * ts/seq order columns are excluded from the key automatically.
    */
  def dedupIgnore(df: DataFrame, ignore: Seq[String], tsCol: String, seqCol: String): DataFrame = {
    val keys = df.columns.filterNot(c =>
      ignore.contains(c) || c == tsCol || c == seqCol).toSeq
    require(keys.nonEmpty, "Ignore mode removed every key column")
    firstPerKey(df, keys, tsCol, seqCol)
  }

  private def firstPerKey(df: DataFrame, keys: Seq[String], tsCol: String,
      seqCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol), col(seqCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
