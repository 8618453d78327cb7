package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over the `documents` and `embeddings`
  * tables (builder-prompt first-class components): tokenization, dedup,
  * quality scoring, language-ID, fingerprinting, similarity search. Everything
  * with a DuckDB-expressible equivalent gets an oracle; the LSH/minhash/simhash
  * families are covered by ScalaTest oracles instead (hash functions differ
  * across engines).
  */
object DocQueries {

  def documents(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  def embeddings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  val BaseTs = 1704067200L // 2024-01-01T00:00:00Z

  /** The north-rule token pipeline end-to-end over real data: tokenize text
    * (whitespace), derive deterministic event-time from doc_id, roll up token
    * counts into 1-minute tiers per source. SQL-expressible so the DuckDB
    * oracle checks the whole pipeline.
    */
  def tokenRollup1m(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .withColumn("n_tok", size(split(col("text"), " ")))
      .withColumn("ts", lit(BaseTs) + pmod(col("doc_id"), lit(86400L)))
      .withColumn("bucket", (floor(col("ts") / 60) * 60).cast("long"))
      .groupBy(col("source"), col("bucket"))
      .agg(sum(col("n_tok")).cast("long").as("sum_tok"), count(lit(1)).as("cnt"),
        min(col("n_tok")).cast("long").as("min_tok"), max(col("n_tok")).cast("long").as("max_tok"))
      .orderBy(col("source"), col("bucket"))

  /** Exact dedup by content hash (hash-groupBy; builder-prompt dedup #1).
    * Keeper = lowest doc_id per group; groups and sizes are the output.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("dup_cnt"), min(col("doc_id")).as("keeper_doc_id"))
      .orderBy(col("content_hash"))

  /** Quality scoring: per-source aggregate of length / word-shape signals. */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val words = size(split(col("text"), " "))
    val theCnt = ((length(col("text")) - length(regexp_replace(col("text"), "the", ""))) / 3)
      .cast("long")
    documents(s, dir)
      .select(col("source"), col("n_chars"), words.as("words"), theCnt.as("the_cnt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        round(avg(col("words")), 4).as("avg_words"),
        round(avg(col("n_chars").cast("double") / col("words")), 4).as("avg_word_len"),
        sum(col("the_cnt")).as("stopword_hits"))
      .orderBy(col("source"))
  }

  /** Language-ID heuristic (n-gram/stopword): confusion matrix vs the table's
    * lang column.
    */
  def langId(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .withColumn("predicted",
        when(col("text").contains(" the "), "en")
          .when(col("text").contains(" der "), "de")
          .otherwise("other"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("lang"), col("predicted"))

  /** Token counting: whitespace tokens and a regex word-ish tokenizer. */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("ws_tok"),
        size(regexp_extract_all(col("text"), lit("[a-zA-Z]+"), lit(0))).cast("long").as("re_tok"))
      .groupBy(col("source"))
      .agg(sum(col("ws_tok")).as("ws_tokens"), sum(col("re_tok")).as("re_tokens"),
        count(lit(1)).as("docs"))
      .orderBy(col("source"))

  /** Document fingerprinting: stable 64-bit content fingerprint (hex). */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"), substring(md5(col("text")), 1, 16).as("fp"))
      .orderBy(col("doc_id"))

  /** Brute-force cosine similarity of every embedding against the vec_id=0
    * query vector (similarity-search baseline). Double-precision math via
    * zip_with + aggregate; rounded for cross-engine hash parity.
    */
  def annCosineAll(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    e.crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        aggregate(zip_with(col("embedding"), col("q_emb"),
          (a, b) => a.cast("double") * b.cast("double")), lit(0.0), (acc, x) => acc + x).as("dot"),
        sqrt(aggregate(transform(col("embedding"), a => a.cast("double") * a.cast("double")),
          lit(0.0), (acc, x) => acc + x)).as("na"),
        sqrt(aggregate(transform(col("q_emb"), a => a.cast("double") * a.cast("double")),
          lit(0.0), (acc, x) => acc + x)).as("nq"))
      .select(col("vec_id"), col("label"),
        round(col("dot") / (col("na") * col("nq")), 5).as("cosine"))
      .orderBy(col("vec_id"))
  }
}
