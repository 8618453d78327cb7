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

  /** Stopword profiles for the language-ID classifier — high-frequency
    * function words per language (public-knowledge lists; profile order is
    * the deterministic tie-break priority). The classifier scores each
    * language by whole-word stopword hits and predicts the argmax ('other'
    * when no profile hits) — the classic n-gram/stopword-profile heuristic,
    * fully deterministic so the DuckDB oracle replays the identical rule.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "ist", "nicht", "das"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "es" -> Seq("el", "los", "las", "una", "es", "y"),
    "it" -> Seq("il", "che", "di", "per", "non", "sono"),
    "pt" -> Seq("os", "uma", "do", "da", "em", "com"),
    "nl" -> Seq("het", "een", "van", "niet", "op", "ik"),
    "zh" -> Seq("的", "是", "不", "了", "在", "和"))

  /** Language-ID (stopword-profile argmax over [[langProfiles]]): confusion
    * matrix vs the table's lang column. The 48 whole-word probes run in one
    * tight JVM UDF loop over the padded text: the equivalent Catalyst
    * expression tree (48 `contains` + greatest + a nested-when argmax) paid
    * a measured ~2.5 s of fixed janino-compile cost PER PLAN regardless of
    * data size — the same compile-vs-run trade as the MinHash signature
    * loop (Dedup.scala). No shuffle beyond the final tiny groupBy.
    */
  private lazy val langIdUdf = {
    val profiles = langProfiles.map { case (l, ws) =>
      (l, ws.map(w => s" $w ").toArray) }.toArray
    udf { (text: String) =>
      if (text == null) "other"
      else {
        val padded = " " + text + " "
        var best = "other"; var bestScore = 0; var i = 0
        while (i < profiles.length) {
          val (l, ws) = profiles(i)
          var sc = 0; var j = 0
          while (j < ws.length) { if (padded.contains(ws(j))) sc += 1; j += 1 }
          // strict >: the FIRST profile in list order reaching the max wins,
          // and a zero score never displaces 'other' — identical to the
          // generated oracle's CASE order
          if (sc > bestScore) { bestScore = sc; best = l }
          i += 1
        }
        best
      }
    }
  }

  def langId(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .withColumn("predicted", langIdUdf(col("text")))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("lang"), col("predicted"))

  /** Per-doc predicted-language oracle fragment: CTEs ending in
    * `pred(doc_id, lang, source, text, predicted)`, reading from a caller-
    * defined CTE named `docs`. Shared by the q19 and q60 oracles — both are
    * generated from the same [[langProfiles]] table as the UDF, so the SQL
    * rule and the Scala rule cannot drift.
    */
  val langPredCtes: String = {
    val scoreExprs = langProfiles.map { case (l, ws) =>
      ws.map(w => s"contains(t, ' $w ')::INT").mkString(" + ") + s" AS s_$l"
    }.mkString(",\n  ")
    val mx = langProfiles.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
    val cases = langProfiles.map { case (l, _) => s"WHEN s_$l = mx THEN '$l'" }.mkString(" ")
    s"""p AS (SELECT doc_id, lang, source, text, ' ' || text || ' ' AS t FROM docs),
       |s AS (SELECT doc_id, lang, source, text,
       |  $scoreExprs
       |FROM p),
       |m AS (SELECT *, $mx AS mx FROM s),
       |pred AS (SELECT doc_id, lang, source, text,
       |  CASE WHEN mx = 0 THEN 'other' $cases END AS predicted
       |FROM m)""".stripMargin
  }

  /** DuckDB twin of [[langId]], generated from the same profile table so the
    * two rules cannot drift.
    */
  val langIdOracle: String =
    s"""WITH docs AS (SELECT doc_id, lang, source, text FROM documents),
       |$langPredCtes
       |SELECT lang, predicted, count(*) AS cnt
       |FROM pred GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin

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

  /** q55: ROLLING-hash fingerprinting by winnowing (graft.ops.Winnow —
    * SIGMOD'03): per doc, k-gram polynomial hashes (base 257 mod 1e9+7,
    * exact BIGINT math) → distinct window-of-16 minima. The DuckDB oracle
    * replays the identical arithmetic with list lambdas, so the whole
    * fingerprint pipeline — not just a summary — is cross-engine-pinned
    * (q21 stays the whole-content-hash mode).
    */
  def winnowFingerprint(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"), graft.ops.Winnow.statsCol(col("text")).as("f"))
      .select(col("doc_id"), col("f.n_kgrams").as("n_kgrams"),
        col("f.n_fps").as("n_fps"), col("f.min_fp").as("min_fp"),
        col("f.fp_sum").as("fp_sum"))
      .orderBy(col("doc_id"))

  val winnowFingerprintOracle: String =
    """WITH g AS (SELECT doc_id,
      |  CASE WHEN length(text) >= 8 THEN
      |    list_transform(generate_series(1, length(text)-7), i ->
      |      list_reduce(list_transform(generate_series(0, 7),
      |          j -> unicode(substring(text, i+j, 1))::BIGINT),
      |        (h, c) -> (h*257 + c) % 1000000007))
      |  ELSE [] END AS hs FROM documents),
      |w AS (SELECT doc_id, len(hs)::BIGINT AS n_kgrams,
      |  CASE WHEN len(hs) = 0 THEN []
      |  ELSE list_distinct(list_transform(generate_series(1, greatest(len(hs)-15, 1)), i ->
      |    list_min(hs[i:least(i+15, len(hs))]))) END AS fps FROM g)
      |SELECT doc_id, n_kgrams, len(fps)::BIGINT AS n_fps,
      |  CASE WHEN len(fps) = 0 THEN NULL ELSE list_min(fps) END AS min_fp,
      |  CASE WHEN len(fps) = 0 THEN NULL ELSE list_sum(fps)::BIGINT END AS fp_sum
      |FROM w ORDER BY doc_id""".stripMargin

  /** q60: the corpus-curation pipeline composed end-to-end — the frame a
    * training-data build actually ships: exact dedup (md5 keeper), language
    * gate (stopword-profile argmax ≠ 'other'), length gate (20..80 whitespace
    * words), reported as per-(source, drop-reason) doc and token counts. The
    * first failing rule in the fixed order dup → lang → len names the reason;
    * survivors are 'kept'. A deterministic clone of every 10th doc
    * (doc_id + 10⁷, identical text — the q52 planting pattern) is unioned in
    * so the dup branch provably fires on a table with no natural exact dups.
    * Each stage is the repo's existing operator shape (q17's hash-groupBy,
    * q19's language rule, q20's tokenizer); at 100 TB the only wide ops are
    * one hash shuffle for the keeper groupBy and its equi-join back — both
    * keyed on the content hash, both AQE-skew-safe.
    */
  def corpusCurate(s: SparkSession, dir: String): DataFrame = {
    val base = documents(s, dir)
    val clones = base.filter(pmod(col("doc_id"), lit(10)) === 0)
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
    val d = base.unionByName(clones)
      .select(col("doc_id"), col("source"),
        langIdUdf(col("text")).as("predicted"),
        size(split(col("text"), " ")).cast("long").as("words"),
        md5(col("text")).as("h"))
    val keepers = d.groupBy(col("h")).agg(min(col("doc_id")).as("keeper"))
    d.join(keepers, "h")
      .withColumn("reason",
        when(col("doc_id") =!= col("keeper"), "dup")
          .when(col("predicted") === "other", "lang")
          .when(col("words") < 20 || col("words") > 80, "len")
          .otherwise("kept"))
      .groupBy(col("source"), col("reason"))
      .agg(count(lit(1)).as("n_docs"), sum(col("words")).as("sum_tokens"))
      .orderBy(col("source"), col("reason"))
  }

  /** DuckDB twin of [[corpusCurate]], sharing [[langPredCtes]]. */
  val corpusCurateOracle: String =
    s"""WITH docs AS (
       |  SELECT doc_id, lang, source, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 10000000, lang, source, text FROM documents
       |  WHERE doc_id % 10 = 0),
       |$langPredCtes,
       |w AS (SELECT doc_id, source, predicted,
       |  len(string_split(text, ' '))::BIGINT AS words, md5(text) AS h FROM pred),
       |k AS (SELECT h, min(doc_id) AS keeper FROM w GROUP BY 1),
       |r AS (SELECT w.source, w.words,
       |  CASE WHEN w.doc_id <> k.keeper THEN 'dup'
       |       WHEN w.predicted = 'other' THEN 'lang'
       |       WHEN w.words < 20 OR w.words > 80 THEN 'len'
       |       ELSE 'kept' END AS reason
       |  FROM w JOIN k USING (h))
       |SELECT source, reason, count(*) AS n_docs, sum(words)::BIGINT AS sum_tokens
       |FROM r GROUP BY 1, 2 ORDER BY source, reason""".stripMargin

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

  /** q64: sequence-packing census — documents laid end-to-end per source in
    * doc_id order and chunked into 1000-token training sequences
    * ([[graft.ops.Pack.packCensus]]'s two-phase distributed prefix sum; no
    * per-source window task). Output per (source, seq_id): docs touching the
    * sequence, tokens landing in it, docs carried across its left boundary.
    */
  def packCensusDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    graft.ops.Pack.packCensus(docs, "source", "doc_id", "n_tok", budget = 1000L)
      .select(col("source"), col("seq_id"), col("n_docs"),
        col("n_tok").as("seq_tok"), col("n_carried"))
      .orderBy(col("source"), col("seq_id"))
  }

  /** DuckDB twin of [[packCensusDocs]]: window-function exclusive prefix sum
    * + generate_series explode — engine-independent of the bucketed layout.
    */
  val packCensusOracle: String =
    """WITH d AS (
      |  SELECT source, doc_id, len(string_split(text, ' '))::BIGINT AS n_tok
      |  FROM documents),
      |c AS (
      |  SELECT source, n_tok,
      |    COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS ex_cum
      |  FROM d),
      |e AS (
      |  SELECT source, ex_cum, n_tok,
      |    unnest(range(ex_cum // 1000, (ex_cum + n_tok - 1) // 1000 + 1)) AS seq_id
      |  FROM c WHERE n_tok > 0)
      |SELECT source, seq_id, count(*) AS n_docs,
      |  sum(least(ex_cum + n_tok, (seq_id + 1) * 1000)
      |      - greatest(ex_cum, seq_id * 1000))::BIGINT AS seq_tok,
      |  sum(CASE WHEN ex_cum < seq_id * 1000 THEN 1 ELSE 0 END)::BIGINT AS n_carried
      |FROM e GROUP BY 1, 2 ORDER BY source, seq_id""".stripMargin
}
