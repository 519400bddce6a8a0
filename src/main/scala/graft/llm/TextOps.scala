package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Text-analysis operators for LLM training-data pipelines
  * (SURVEY.md §0 scope addendum + §2.9): per-document statistics,
  * quality scoring, token counting, heuristic language ID, document
  * fingerprinting, corpus profiling, JSON property extraction.
  *
  * All operators are narrow per-row transformations (no shuffle) or
  * single hash aggregations, built from codegen'd `functions._` — no
  * UDFs — so at 100 TB they stream through whole-stage codegen at scan
  * speed. Token vectors use higher-order array functions
  * (`filter`/`transform`/`aggregate`) which evaluate without
  * serialization overhead.
  */
object TextOps {

  /** Whitespace tokens — the shared rule (see functions.Tokenize for why
    * it is defined exactly once). */
  private def tokens(c: org.apache.spark.sql.Column) =
    graft.functions.Tokenize.tokens(c)

  /** Per-document statistics: char count, token count, regex-token count
    * (BPE-ish `[a-z]+|[0-9]+` word/number pieces), mean token length. */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(toks).as("n_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0))).as("n_pieces"),
        when(size(toks) === 0, 0.0)
          .otherwise(
            aggregate(transform(toks, x => length(x).cast("long")), lit(0L), _ + _)
              .cast("double") / size(toks))
          .as("mean_token_len"))
      .orderBy("doc_id")
  }

  /** Quality scoring (length + stopword-ratio heuristics) with bucketed
    * verdicts — the filter stage of a data-cleaning pipeline. Integer
    * token counts divide exactly, so the ratio is oracle-stable. */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val stop = size(filter(toks, x => x.isin("the", "a", "of", "and", "to")))
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        col("n_chars"),
        size(toks).as("n_tokens"),
        stop.as("n_stopwords"),
        when(size(toks) === 0, lit(0.0))
          .otherwise(stop.cast("double") / size(toks)).as("stopword_ratio"),
        when(size(toks) < 5, "too_short")
          .when(stop === 0, "no_stopwords")
          .otherwise("ok").as("quality"))
      .orderBy("doc_id")
  }

  /** Corpus profile per language: doc counts, char volume, exact mean
    * length (long sums divide identically in both engines), distinct
    * sources. */
  def langProfile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("mean_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")

  /** Token frequency: explode → hash-aggregate → top-k. The classic
    * vocabulary-building job; partial aggregation keeps the shuffle at
    * |vocab| not |corpus|. Top-k ties broken by token for determinism. */
  def tokenFreq(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(20)

  /** Content fingerprint for exact dedup at scale: md5 of normalized
    * text. Hash-based identity never ships full text through a shuffle —
    * at 100 TB you group on the 128-bit digest, not the document. */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        md5(lower(trim(col("text")))).as("fingerprint"))
      .orderBy("doc_id")

  /** Exact deduplication: canonical doc per fingerprint group (lowest
    * doc_id wins), with copy counts. Grouping on the digest keeps the
    * shuffle key 16 bytes regardless of document size. */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy("canonical_id")

  /** Heuristic language ID from stopword evidence — the n-gram-style
    * scoring shape (per-class token-hit counts → argmax) expressed
    * relationally. Fixture text is synthetic English-ish vocabulary, so
    * the interesting part is the plan: per-row array scoring, no joins,
    * no shuffle. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val enHits = size(filter(toks, x => x.isin("the", "a", "of", "and")))
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        col("lang").as("labeled_lang"),
        enHits.as("en_evidence"),
        when(size(toks) === 0, "empty")
          .when(enHits > 0, "en").otherwise("unknown").as("guessed_lang"))
      .orderBy("doc_id")
  }

  /** JSON property extraction from the events stream (events.props is a
    * JSON string): pull `$.k`, aggregate per event_type. */
  def jsonProps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Rolling-hash document fingerprinting (winnowing): char-8-gram
    * Karp-Rabin hashes, window minima, distinct — shared substrings of
    * length ≥ 23 guarantee shared fingerprints even when edits shift
    * the rest of the document. Kernel-hashed → rows-only driver check;
    * shift-robustness pinned in NearDupSpec. */
  def rollingFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.HashKernels.winnow_fingerprint(col("text"), 8, 16).as("fp"))
      .filter(col("fp").isNotNull)
      .select(col("doc_id"), size(col("fp")).as("n_fingerprints"),
        element_at(col("fp"), 1).as("fp_min"))
      .orderBy("doc_id")

  /** Character-n-gram language ID: per-class trigram evidence counts →
    * argmax, the classic n-gram heuristic expressed as pure column
    * algebra (no join, no shuffle — profile trigrams are inline
    * literals; a full model would broadcast a (lang, trigram, logp)
    * dim instead, same plan shape). */
  def charNgramLangId(s: SparkSession, dir: String): DataFrame = {
    // fused kernel: the composed transform(sequence…substr) + filter form
    // materializes every trigram interpreted — 18 s at sf0.1 vs <1 s
    import graft.functions.HashKernels.trigram_hits
    val enHits = trigram_hits(col("text"), Seq("the", "he ", " th", "ing", "nd "))
    val jarHits = trigram_hits(col("text"), Seq("spa", "par", "ark", "sca", "que"))
    t(s, dir, "documents")
      .select(col("doc_id"), enHits.as("en_score"), jarHits.as("jargon_score"),
        when(length(col("text")) < 3, "und")
          .when(enHits > jarHits, "en")
          .when(jarHits > enHits, "jargon")
          .otherwise("und").as("guess"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: flag every training document that shares
    * at least one word 8-gram with the held-out eval slice (stand-in:
    * doc_id ≡ 0 mod 29 — in production this is the benchmark table).
    * 8-grams are the community-standard contamination test: long enough
    * that sharing one is evidence of copying, not chance.
    *
    * Scale shape: the eval side of an overlap check is always tiny, so
    * its distinct gram set BROADCASTS and the corpus is flagged in one
    * map-side semi-join pass — no shuffle of the training corpus at any
    * scale. Output: every training doc with its matched-gram count. */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashKernels.shingle_array
    val docs = graft.Tables.tSpread(s, dir, "documents")
    val evalGrams = docs.filter(col("doc_id") % 29 === 0)
      .select(explode(shingle_array(col("text"), 8)).as("gram"))
      .distinct()
    val trainGrams = docs.filter(col("doc_id") % 29 =!= 0)
      .select(col("doc_id"), explode(shingle_array(col("text"), 8)).as("gram"))
    val hits = trainGrams.join(broadcast(evalGrams), Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_grams"))
    docs.filter(col("doc_id") % 29 =!= 0).select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"),
        (coalesce(col("n_shared_grams"), lit(0L)) > 0).as("contaminated"))
      .orderBy("doc_id")
  }

  /** PII-style redaction over the events props payload: digit runs →
    * `<NUM>`, email-shaped tokens → `<EMAIL>`. Pure per-row regex
    * rewriting (codegen'd, patterns compiled once) — the text-cleaning
    * shape of a pre-training scrub pass, applied here to the one fixture
    * column that actually contains digits. */
  def redactPii(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"), col("props"),
        regexp_replace(
          regexp_replace(col("props"), "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
          "[0-9]+", "<NUM>").as("props_redacted"),
        regexp_count(col("props"), lit("[0-9]+")).cast("long").as("n_digit_runs"))
      .orderBy("event_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_decontaminate" -> decontaminate,
    "q69_redact_pii"    -> redactPii,
    "q54_rolling_fingerprint" -> rollingFingerprint,
    "q55_char_ngram_langid"   -> charNgramLangId,
    "q30_text_stats"    -> textStats,
    "q31_quality_score" -> qualityScore,
    "q32_lang_profile"  -> langProfile,
    "q33_token_freq"    -> tokenFreq,
    "q34_fingerprint"   -> fingerprint,
    "q35_exact_dedup"   -> exactDedup,
    "q36_lang_id"       -> langId,
    "q37_json_props"    -> jsonProps)

  val oracleSql: Map[String, String] = Map(
    "q68_decontaminate" ->
      """WITH grams AS (
        |  SELECT doc_id,
        |    CASE WHEN len(tk) < 8 THEN []
        |      ELSE list_distinct(list_transform(generate_series(1, len(tk) - 7),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' '
        |          || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7])) END AS gs
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |        FROM documents)),
        |eval_g AS (SELECT DISTINCT unnest(gs) AS gram FROM grams WHERE doc_id % 29 = 0),
        |train_g AS (SELECT doc_id, unnest(gs) AS gram FROM grams WHERE doc_id % 29 <> 0),
        |hits AS (
        |  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
        |  FROM train_g t JOIN eval_g e ON t.gram = e.gram
        |  GROUP BY t.doc_id)
        |SELECT d.doc_id,
        |  COALESCE(h.n_shared_grams, 0) AS n_shared_grams,
        |  COALESCE(h.n_shared_grams, 0) > 0 AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 29 <> 0) d
        |LEFT JOIN hits h ON h.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q69_redact_pii" ->
      """SELECT event_id, props,
        |  regexp_replace(
        |    regexp_replace(props, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |    '[0-9]+', '<NUM>', 'g') AS props_redacted,
        |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_digit_runs
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q55_char_ngram_langid" ->
      """WITH tri AS (
        |  SELECT doc_id,
        |    CASE WHEN length(text) < 3 THEN []
        |         ELSE list_transform(generate_series(1, length(text) - 2),
        |                             i -> substr(text, i, 3)) END AS t3,
        |    length(text) AS len
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(t3, t -> t IN ('the', 'he ', ' th', 'ing', 'nd '))) AS INTEGER) AS en_score,
        |  CAST(len(list_filter(t3, t -> t IN ('spa', 'par', 'ark', 'sca', 'que'))) AS INTEGER) AS jargon_score,
        |  CASE WHEN len < 3 THEN 'und'
        |       WHEN len(list_filter(t3, t -> t IN ('the', 'he ', ' th', 'ing', 'nd ')))
        |          > len(list_filter(t3, t -> t IN ('spa', 'par', 'ark', 'sca', 'que'))) THEN 'en'
        |       WHEN len(list_filter(t3, t -> t IN ('spa', 'par', 'ark', 'sca', 'que')))
        |          > len(list_filter(t3, t -> t IN ('the', 'he ', ' th', 'ing', 'nd '))) THEN 'jargon'
        |       ELSE 'und' END AS guess
        |FROM tri ORDER BY doc_id""".stripMargin,
    "q30_text_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_chars,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INTEGER) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INTEGER) AS n_pieces,
        |  CASE WHEN len(list_filter(string_split(text, ' '), x -> x <> '')) = 0 THEN 0.0
        |       ELSE CAST(list_sum(list_transform(list_filter(string_split(text, ' '), x -> x <> ''), x -> length(x))) AS DOUBLE)
        |            / len(list_filter(string_split(text, ' '), x -> x <> '')) END AS mean_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q31_quality_score" ->
      """WITH tk AS (
        |  SELECT doc_id, n_chars,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents)
        |SELECT doc_id, n_chars,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to'))) AS INTEGER) AS n_stopwords,
        |  CASE WHEN len(toks) = 0 THEN 0.0
        |       ELSE CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to'))) AS DOUBLE) / len(toks) END AS stopword_ratio,
        |  CASE WHEN len(toks) < 5 THEN 'too_short'
        |       WHEN len(list_filter(toks, x -> x IN ('the','a','of','and','to'))) = 0 THEN 'no_stopwords'
        |       ELSE 'ok' END AS quality
        |FROM tk ORDER BY doc_id""".stripMargin,
    "q32_lang_profile" ->
      """SELECT lang,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars,
        |  COUNT(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q33_token_freq" ->
      """SELECT token, COUNT(*) AS freq FROM (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents)
        |GROUP BY token ORDER BY freq DESC, token LIMIT 20""".stripMargin,
    "q34_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q35_exact_dedup" ->
      """SELECT md5(lower(trim(text))) AS fingerprint,
        |  MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY canonical_id""".stripMargin,
    "q36_lang_id" ->
      """WITH tk AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents)
        |SELECT doc_id, lang AS labeled_lang,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and'))) AS INTEGER) AS en_evidence,
        |  CASE WHEN len(toks) = 0 THEN 'empty'
        |       WHEN len(list_filter(toks, x -> x IN ('the','a','of','and'))) > 0 THEN 'en'
        |       ELSE 'unknown' END AS guessed_lang
        |FROM tk ORDER BY doc_id""".stripMargin,
    "q37_json_props" ->
      """SELECT event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
        |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
