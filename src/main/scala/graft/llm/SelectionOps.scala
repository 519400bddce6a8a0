package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.HashKernels.shingle_array

/** Target-distribution data selection (DSIR-style importance weighting,
  * Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling"): score each candidate document by how much its hashed
  * n-gram profile looks like a curated TARGET corpus rather than the
  * raw pool, then select the candidates whose likelihood ratio favors
  * the target. This is the data-SELECTION complement of the dedup /
  * quality / decontamination families: those remove bad rows, this
  * ranks the survivors against the distribution you actually want to
  * train on.
  *
  * Feature model (the paper's hashed n-gram bag, binary per-doc
  * variant): a doc's features are its DISTINCT word unigrams and
  * bigrams, each hashed into one of B = 65536 buckets. Bucket unigram
  * and bigram models are fit with add-1 smoothing on the target side
  * (`ct`, total `Nt`) and the candidate side (`cr`, total `Nr`); a
  * doc's weight is the summed per-bucket log likelihood ratio
  *
  *   w(d) = Σ_{g ∈ grams(d)}  ln p_t(b(g)) − ln p_r(b(g))
  *        = Σ  ln(ct+1) − ln(cr+1) + ln(Nr+B) − ln(Nt+B)
  *
  * Engine-portability discipline (the q95/q152 lessons, taken one step
  * further): the four-ln per-bucket term is rounded ONCE to fixed point
  * — `floor(x·10⁶ + 0.5)` is the midpoint rule both engines agree on —
  * and everything after that is exact BIGINT arithmetic: per-doc
  * weights are integer sums (order-free, unlike the sorted-float-sum
  * dance q95 needs), the q180 selection test `weight > 0` is an exact
  * integer comparison, and the report rates are integer divisions. The
  * only cross-engine tie surface is a bucket's ln landing within one
  * ulp of a .5 fixed-point boundary — ≤ B = 65536 chances, the same
  * accepted measure-zero class as the round(sim,4) cosine oracles.
  *
  * Hashing is md5-prefix (`substring(md5(gram),1,4)` → 16-bit bucket
  * key as fixed-width hex), the repo's standard DuckDB-reproducible
  * hash; the per-row tokenize/shingle path is the fused
  * [[graft.functions.ShingleArray]] kernel per the round-4
  * interpreted-lambda rule.
  *
  * Scale shape (100 TB): the bucket-stat passes are corpus-scale
  * aggregations keyed on a 4-char digest with map-side combine — at
  * most B rows per task leave any partition, and the published stat
  * frame is ≤ B = 65536 rows, broadcast to the scoring pass. Scoring
  * is explode → broadcast-join → per-doc partial sum: a doc's grams
  * never leave its input partition before the combine, so the only
  * corpus-scale shuffle carries one pre-aggregated row per doc. The
  * q180 selector is threshold-based (likelihood ratio > 1), NOT a
  * global top-fraction rank — a corpus-sized sort-window is exactly
  * the q110/q115 scale-killer class PlanAuditSpec bans; when a fixed
  * budget k is wanted, q179's orderBy+limit (TakeOrderedAndProject)
  * is the scale-safe form.
  *
  * Reference scope note: the reference engine has no selection surface
  * (its corpus is game telemetry, `/root/reference/src/
  * bronze_generator.py`); this family is part of the mandated
  * beyond-parity training-data-pipeline surface.
  */
object SelectionOps {

  /** The curated target domain: four sources play the role of the
    * high-quality corpus the selection should steer toward. */
  val targetSources: Seq[String] = Seq("src1", "src2", "src3", "src4")

  private val B = 65536

  /** (doc_id, source, bucket) — one row per distinct unigram/bigram
    * per doc, bucketed by md5 prefix. Unigrams and bigrams cannot
    * collide pre-hash (bigrams contain a space, split tokens cannot),
    * so the concat is a disjoint union of the two distinct sets. */
  private def gramBuckets(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        explode(concat(shingle_array(col("text"), 1),
          shingle_array(col("text"), 2))).as("gram"))
      .select(col("doc_id"), col("source"),
        substring(md5(col("gram")), 1, 4).as("bucket"))

  private def isTarget = col("source").isin(targetSources: _*)

  /** Per-bucket fixed-point log likelihood ratio (micro-nats). Both
    * sides' counts AND their totals come from ONE explode of the
    * corpus: a single conditional aggregation keyed on the bucket
    * digest yields (ct, cr) per bucket, and the totals (Nt, Nr) are a
    * second aggregation over that ≤ B-row frame — not another corpus
    * pass. (The naive per-side count/total formulation scans and
    * shingles the corpus four times; at 100 TB the shingle explode IS
    * the cost, so stats must be fit in exactly one pass.) */
  private def bucketStats(s: SparkSession, dir: String): DataFrame = {
    // Materialized so the totals aggregation below reads the ≤ B-row
    // count frame instead of re-running the corpus explode (lazily the
    // perBucket subtree would appear twice in the plan — a third
    // corpus pass).
    val perBucket = graft.Materialize.stable(
      gramBuckets(t(s, dir, "documents"))
        .groupBy("bucket")
        .agg(sum(when(isTarget, 1L).otherwise(0L)).as("ct"),
          sum(when(!isTarget, 1L).otherwise(0L)).as("cr")))
    val totals = perBucket
      .agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
      .select(coalesce(col("nt"), lit(0L)).as("nt"),
        coalesce(col("nr"), lit(0L)).as("nr"))
    perBucket.crossJoin(broadcast(totals))
      .select(col("bucket"),
        floor((log(col("ct").cast("double") + 1.0)
          - log(col("cr").cast("double") + 1.0)
          + log(col("nr").cast("double") + B.toDouble)
          - log(col("nt").cast("double") + B.toDouble)) * 1e6 + 0.5)
          .cast("long").as("microlog"))
  }

  /** Per-candidate-doc importance weight: exact BIGINT sum of the
    * broadcast per-bucket micro-nat ratios over the doc's grams. */
  private def candidateWeights(s: SparkSession, dir: String): DataFrame =
    gramBuckets(t(s, dir, "documents")).filter(!isTarget)
      .join(broadcast(bucketStats(s, dir)), Seq("bucket"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_grams"),
        sum(col("microlog")).as("weight_micro"))

  /** q179 — the k candidate docs whose hashed-ngram profile is most
    * target-like (fixed-budget selection; TakeOrderedAndProject). */
  def dsirWeights(s: SparkSession, dir: String): DataFrame =
    candidateWeights(s, dir)
      .orderBy(col("weight_micro").desc, col("doc_id"))
      .limit(100)
      .select(col("doc_id"), col("source"), col("n_grams"),
        col("weight_micro"))

  /** q180 — threshold selection report: a candidate is selected iff its
    * likelihood ratio favors the target (weight > 0 micro-nats; docs
    * with no grams are unselected). Per-source counts, the selection
    * rate in exact basis points, and the selected mass — all BIGINT. */
  def dsirSelect(s: SparkSession, dir: String): DataFrame = {
    // Both sides aggregate to ≤ |sources| rows BEFORE the join — a
    // corpus-scale doc_id join (documents ⋈ weights) would shuffle the
    // whole candidate pool just to count it. Docs with no grams exist
    // only in the denominator side, which is why the join is on the
    // tiny per-source frames, not per doc.
    val selPerSrc = candidateWeights(s, dir)
      .filter(col("weight_micro") > 0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_selected"),
        sum(col("weight_micro")).as("sel_weight_micro"))
    t(s, dir, "documents").filter(!isTarget)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .join(broadcast(selPerSrc), Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        expr("(coalesce(n_selected, 0L) * 10000) div n_docs")
          .as("sel_rate_bp"),
        coalesce(col("sel_weight_micro"), lit(0L)).as("sel_weight_micro"))
      .orderBy("source")
  }

  /** q181 — temperature-based multilingual mixture planning (the
    * exponentiated-share rebalancing of Conneau & Lample 2019 §3.1 /
    * UniMax's motivating baseline, Chung et al. 2023): sampling weight
    * ∝ (token share)^α with α = 0.3, which up-weights low-resource
    * strata relative to proportional sampling; then, under a fixed
    * 10⁹-token draw budget, the per-stratum epoch count — the number
    * that tells you which languages the budget forces into repetition
    * (the data-constrained regime of Muennighoff et al. 2023).
    *
    * This PLANS the mixture q63's `hashSample` executes: q63 applies
    * fixed per-stratum keep-rates; q181 derives rates from the corpus.
    * Relation to q82 (`CorpusOps.mixtureWeights`): q82 reports the
    * classic doc-count weights w_s ∝ n_docs^0.5 per SOURCE as rounded
    * floats; q181 budgets per LANGUAGE on TOKEN shares (epochs are a
    * token-denominated quantity — doc counts misprice strata whose
    * documents differ in length), adds the budget/epoch arithmetic
    * q82 stops short of, and shows the fixed-point discipline that
    * keeps a general non-sqrt `pow` oracle-stable (q82 pinned α at
    * 0.5 precisely because sqrt is correctly rounded — rounding the
    * pow ONCE to an integer then summing integers lifts that
    * restriction).
    *
    * Numeric discipline: one `pow(share, 0.3)` per stratum rounded
    * once to micro fixed point (midpoint rule; ≤ |langs| tie chances),
    * then rates, drawn tokens, and milli-epochs are exact BIGINT
    * products and divisions of those integers. Plan: one partial-agg
    * pass over documents (per-doc token count → per-lang sums), then
    * arithmetic over a |langs|-row frame against a broadcast 1-row
    * totals frame. */
  def temperatureMix(s: SparkSession, dir: String): DataFrame = {
    // One corpus pass: the per-lang sums are materialized (≤ |langs|
    // rows) so the totals / weight-sum aggregates below reread them
    // instead of re-planning the corpus aggregation. All-empty-text
    // strata (tot_tokens = 0) short-circuit to zero rates rather than
    // ANSI div-by-zero / NaN-cast errors.
    val perLang = graft.Materialize.stable(
      t(s, dir, "documents")
        .select(col("lang"),
          size(graft.functions.Tokenize.tokens(col("text"))).cast("long")
            .as("n_toks"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens")))
    val totals = perLang.agg(sum(col("n_tokens")).as("tot_tokens"))
    val weighted = perLang.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        expr("CASE WHEN tot_tokens > 0 THEN (n_tokens * 10000) div tot_tokens "
          + "ELSE 0L END").as("share_bp"),
        when(col("tot_tokens") > 0,
          floor(pow(col("n_tokens").cast("double")
            / col("tot_tokens").cast("double"), 0.3) * 1e6 + 0.5)
            .cast("long")).otherwise(lit(0L)).as("w_micro"))
    val wSum = weighted.agg(sum(col("w_micro")).as("w_sum"))
    weighted.crossJoin(broadcast(wSum))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("share_bp"),
        expr("CASE WHEN w_sum > 0 THEN (w_micro * 10000) div w_sum "
          + "ELSE 0L END").as("rate_bp"))
      .withColumn("drawn_tokens", expr("rate_bp * 100000"))
      .withColumn("epochs_milli",
        expr("CASE WHEN n_tokens > 0 THEN (drawn_tokens * 1000) div n_tokens "
          + "ELSE 0L END"))
      .orderBy("lang")
  }

  // ---- quality-classifier selection (q183/q184) --------------------------

  private val stopWords = Seq("the", "a", "of", "to", "and", "in", "is")

  /** The TEACHER label: q102's Gopher rules in exact integer form —
    * `10·sum_wlen` between `40·n_words` and `50·n_words` is the
    * mean-word-length window with the division cross-multiplied away,
    * so the label has NO float/rounding surface at all (q102's rounded
    * form keeps its own oracle; the classifier's fit must not inherit
    * a boundary-rounding tie that would flip thousands of bucket
    * counts at once). `sum_wlen` is the non-space char count — equal
    * to the sum of token lengths, computed without a per-token pass. */
  private def labeled(docs: DataFrame): DataFrame = {
    val tk = graft.functions.Tokenize.tokens(col("text"))
    // only `text` is required of the input: the streaming counts
    // maintainer feeds bare (doc_id, text) arrival batches through the
    // same label + count path the batch fit uses
    docs.filter(col("text").isNotNull)
      .select(col("text"),
        size(tk).cast("long").as("n_words"),
        length(translate(col("text"), " ", "")).cast("long").as("sum_wlen"),
        graft.functions.HashKernels.token_hits(col("text"), stopWords)
          .cast("long").as("n_stop"))
      .withColumn("keep",
        col("n_words").between(30, 80) && col("n_stop") >= 2 &&
          col("sum_wlen") * 10 >= col("n_words") * 40 &&
          col("sum_wlen") * 10 <= col("n_words") * 50)
  }

  /** The fit's MERGEABLE state: per-bucket teacher-label counts
    * (cp, cn) over `docs`. Counts from disjoint doc sets union-and-sum
    * to exactly the full-corpus counts — plain BIGINTs, no float
    * surface — which is what makes the fit incrementally maintainable
    * (q185's add-batch refit, the streaming counts maintainer). The
    * log-odds transform must run AFTER any merge: weights are not
    * mergeable, counts are. */
  private[graft] def classifierCounts(docs: DataFrame): DataFrame =
    labeled(docs)
      .select(col("keep"),
        explode(concat(shingle_array(col("text"), 1),
          shingle_array(col("text"), 2))).as("gram"))
      .select(col("keep"), substring(md5(col("gram")), 1, 4).as("bucket"))
      .groupBy("bucket")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("cp"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("cn"))

  /** Counts → per-bucket micro-nat NB log-odds (q179's fixed-point
    * discipline). The input is materialized: the totals aggregation
    * below would otherwise re-plan the whole counts subtree. */
  private[graft] def countsToWeights(perBucketRaw: DataFrame): DataFrame = {
    val perBucket = graft.Materialize.stable(perBucketRaw)
    val totals = perBucket
      .agg(sum(col("cp")).as("np"), sum(col("cn")).as("nn"))
      .select(coalesce(col("np"), lit(0L)).as("np"),
        coalesce(col("nn"), lit(0L)).as("nn"))
    perBucket.crossJoin(broadcast(totals))
      .select(col("bucket"),
        floor((log(col("cp").cast("double") + 1.0)
          - log(col("cn").cast("double") + 1.0)
          + log(col("nn").cast("double") + B.toDouble)
          - log(col("np").cast("double") + B.toDouble)) * 1e6 + 0.5)
          .cast("long").as("w_micro"))
  }

  /** Fit: per-bucket Naive-Bayes log-odds of the teacher label over
    * the same hashed distinct-unigram/bigram features as q179, with
    * q179's one-explode-pass and fixed-point discipline. This is the
    * classic linear-classifier initialization (NB-weighted features,
    * the NBSVM/fastText lineage) — "distill the expensive heuristic
    * into a cheap linear scorer", with the heuristic as pseudo-labeler. */
  private def classifierStats(s: SparkSession, dir: String): DataFrame =
    countsToWeights(classifierCounts(t(s, dir, "documents")))

  /** The fit result as ONE dense 65536-long row — the broadcast weight
    * vector the scoring expression indexes. Buckets no gram hashed to
    * default to 0; every scored gram's bucket is present by
    * construction (fit and scoring read the same corpus). Densified by
    * union-with-zeros + one sorted collect — NOT a per-position
    * `element_at(map)` fill: Catalyst maps are array-backed, so 65536
    * linear-scan lookups are O(B²) on one row (measured ~5 s of the
    * original 5.8 s query). */
  private[graft] def weightVectorOf(s: SparkSession,
      stats: DataFrame): DataFrame =
    stats
      .select(conv(col("bucket"), 16, 10).cast("int").as("k"),
        col("w_micro").as("v"))
      .unionByName(s.range(B.toLong)
        .select(col("id").cast("int").as("k"), lit(0L).as("v")))
      .groupBy("k").agg(sum(col("v")).as("v"))
      .agg(collect_list(struct(col("k"), col("v"))).as("kv"))
      .select(transform(array_sort(col("kv")), x => x.getField("v")).as("w"))

  private def weightVector(s: SparkSession, dir: String): DataFrame =
    weightVectorOf(s, classifierStats(s, dir))

  /** All docs scored by the fused inference kernel with the given fit —
    * ONE narrow expression per row: no explode, no join, no per-doc
    * aggregation in the scoring pass (the 100 TB contrast with q179's
    * join-path scoring; see [[graft.functions.TextScoreKernel]]). */
  private[graft] def scoredDocsWith(s: SparkSession, dir: String,
      weights: DataFrame): DataFrame = {
    import graft.functions.TextScoreKernel.linear_text_score
    val w = org.apache.spark.sql.GraftSqlBridge.scalarSubquery(weights)
    t(s, dir, "documents").filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), col("source"),
        size(graft.functions.Tokenize.tokens(col("text"))).cast("long")
          .as("n_tokens"),
        linear_text_score(col("text"), w).as("ns"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"),
        element_at(col("ns"), 1).as("n_grams"),
        element_at(col("ns"), 2).as("score_micro"))
  }

  /** Fit once over the whole corpus, score everything — the q183/q184
    * shared scoring frame. */
  private def scoredDocs(s: SparkSession, dir: String): DataFrame =
    scoredDocsWith(s, dir, weightVector(s, dir))

  /** q183 — the 100 docs the distilled linear scorer rates most
    * quality-like, with the predicted label (score_micro > 0 ⇔ NB
    * posterior favors the teacher's keep class). */
  def qualityClassifier(s: SparkSession, dir: String): DataFrame =
    scoredDocs(s, dir)
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(100)
      .select(col("doc_id"), col("source"), col("n_grams"),
        col("score_micro"), (col("score_micro") > 0).as("pred_keep"))

  /** q185 — incremental classifier refit: a real curation stack refits
    * as ingest batches land, and the fit's state makes that exact — the
    * per-bucket (cp, cn) counts are plain BIGINTs, so a staged base fit
    * plus an O(batch) count pass over ONLY the batch docs union-and-sums
    * into precisely the full-corpus counts, and the log-odds transform
    * runs once over the merged ≤ B-row frame. Same output as q183 BY
    * CONSTRUCTION, so it shares q183's full-hash oracle (the q132/q170
    * add-batch contract: a count lost or double-merged anywhere in the
    * merge is a hash mismatch against the from-scratch fit).
    *
    * Staging form is q170's inline staged state (Materialize.stable on
    * the base counts — at scale the offline fit publishes them as a
    * ≤ 65536-row parquet, which is what the streaming counts maintainer
    * appends deltas to); the batch side's explode touches batch docs
    * only, so per-refit cost is O(batch) + a B-row merge, never a
    * second corpus pass. */
  def classifierAddBatch(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val baseCounts = graft.Materialize.stable(
      classifierCounts(docs.filter(!NearDupOps.isNewDoc(col("doc_id")))))
    val batchCounts =
      classifierCounts(docs.filter(NearDupOps.isNewDoc(col("doc_id"))))
    val merged = baseCounts.unionByName(batchCounts)
      .groupBy("bucket")
      .agg(sum(col("cp")).as("cp"), sum(col("cn")).as("cn"))
    scoredDocsWith(s, dir, weightVectorOf(s, countsToWeights(merged)))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(100)
      .select(col("doc_id"), col("source"), col("n_grams"),
        col("score_micro"), (col("score_micro") > 0).as("pred_keep"))
  }

  /** q184 — the composed select→sample→pack pipeline (q65's sibling
    * with the classifier as the selection stage): keep docs the scorer
    * predicts quality-like, thin by the q63 deterministic mixture
    * filter, pack into 2000-token shards. Every stage is the already-
    * verified building block; the composition is one plan. */
  def classifierPipeline(s: SparkSession, dir: String): DataFrame =
    SamplingOps.packByBudget(
      SamplingOps.mixtureFilter(
        scoredDocs(s, dir).filter(col("score_micro") > 0))
        .select(col("doc_id"), col("lang"), col("n_tokens")),
      budget = 2000L)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q179_dsir_weights" -> dsirWeights,
    "q180_dsir_select" -> dsirSelect,
    "q181_temperature_mix" -> temperatureMix,
    "q183_quality_classifier" -> qualityClassifier,
    "q184_classifier_pipeline" -> classifierPipeline,
    "q185_classifier_add_batch" -> classifierAddBatch)

  private val gramsSql =
    """tkv AS (SELECT doc_id, source,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS tk
      |  FROM documents),
      |g AS (SELECT doc_id, source,
      |    unnest(list_concat(list_distinct(tk),
      |      list_distinct(CASE WHEN len(tk) < 2 THEN []
      |        ELSE list_transform(generate_series(1, len(tk) - 1),
      |             i -> tk[i] || ' ' || tk[i+1]) END))) AS gram
      |  FROM tkv),
      |gb AS (SELECT doc_id, source, substring(md5(gram), 1, 4) AS bucket,
      |    source IN ('src1','src2','src3','src4') AS is_t
      |  FROM g),
      |ctq AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct
      |        FROM gb WHERE is_t GROUP BY bucket),
      |crq AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr
      |        FROM gb WHERE NOT is_t GROUP BY bucket),
      |ntq AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM gb WHERE is_t),
      |nrq AS (SELECT CAST(COUNT(*) AS BIGINT) AS nr FROM gb WHERE NOT is_t),
      |stats AS (SELECT bucket,
      |    CAST(floor((ln(CAST(COALESCE(ct, 0) AS DOUBLE) + 1.0)
      |      - ln(CAST(COALESCE(cr, 0) AS DOUBLE) + 1.0)
      |      + ln(CAST(nr AS DOUBLE) + 65536.0)
      |      - ln(CAST(nt AS DOUBLE) + 65536.0)) * 1e6 + 0.5) AS BIGINT)
      |      AS microlog
      |  FROM ctq FULL OUTER JOIN crq USING (bucket)
      |  CROSS JOIN ntq CROSS JOIN nrq),
      |w AS (SELECT doc_id, ANY_VALUE(source) AS source,
      |    CAST(COUNT(*) AS BIGINT) AS n_grams,
      |    CAST(SUM(microlog) AS BIGINT) AS weight_micro
      |  FROM gb JOIN stats USING (bucket)
      |  WHERE NOT is_t GROUP BY doc_id)""".stripMargin

  // q183/q184 shared CTE: integer-exact teacher label, the q179 gram
  // model re-labeled by it, NB log-odds in micro-nat fixed point, and a
  // LEFT JOIN so gram-less docs score (0, 0) like the kernel.
  private val classifierSql =
    """tkv AS (SELECT doc_id, lang, source, text,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS tk
      |  FROM documents WHERE text IS NOT NULL),
      |lab AS (SELECT doc_id,
      |    (len(tk) BETWEEN 30 AND 80)
      |      AND len(list_filter(tk,
      |        x -> x IN ('the','a','of','to','and','in','is'))) >= 2
      |      AND length(replace(text, ' ', '')) * 10 >= len(tk) * 40
      |      AND length(replace(text, ' ', '')) * 10 <= len(tk) * 50 AS keep
      |  FROM tkv),
      |g AS (SELECT doc_id, unnest(list_concat(list_distinct(tk),
      |      list_distinct(CASE WHEN len(tk) < 2 THEN []
      |        ELSE list_transform(generate_series(1, len(tk) - 1),
      |             i -> tk[i] || ' ' || tk[i+1]) END))) AS gram
      |  FROM tkv),
      |gb AS (SELECT g.doc_id, substring(md5(gram), 1, 4) AS bucket, lab.keep
      |  FROM g JOIN lab USING (doc_id)),
      |cpq AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cp
      |        FROM gb WHERE keep GROUP BY bucket),
      |cnq AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cn
      |        FROM gb WHERE NOT keep GROUP BY bucket),
      |npq AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM gb WHERE keep),
      |nnq AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM gb WHERE NOT keep),
      |stats AS (SELECT bucket,
      |    CAST(floor((ln(CAST(COALESCE(cp, 0) AS DOUBLE) + 1.0)
      |      - ln(CAST(COALESCE(cn, 0) AS DOUBLE) + 1.0)
      |      + ln(CAST(nn AS DOUBLE) + 65536.0)
      |      - ln(CAST(np AS DOUBLE) + 65536.0)) * 1e6 + 0.5) AS BIGINT)
      |      AS w_micro
      |  FROM cpq FULL OUTER JOIN cnq USING (bucket)
      |  CROSS JOIN npq CROSS JOIN nnq),
      |sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
      |    CAST(SUM(w_micro) AS BIGINT) AS score_micro
      |  FROM gb JOIN stats USING (bucket) GROUP BY doc_id),
      |scored AS (SELECT t.doc_id, t.lang, t.source,
      |    CAST(len(t.tk) AS BIGINT) AS n_tokens,
      |    CAST(COALESCE(sc.n_grams, 0) AS BIGINT) AS n_grams,
      |    CAST(COALESCE(sc.score_micro, 0) AS BIGINT) AS score_micro
      |  FROM tkv t LEFT JOIN sc USING (doc_id))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q183_quality_classifier" ->
      s"""WITH $classifierSql
         |SELECT doc_id, source, n_grams, score_micro,
         |  score_micro > 0 AS pred_keep
         |FROM scored ORDER BY score_micro DESC, doc_id LIMIT 100""".stripMargin,
    // q185 shares q183's full-corpus oracle BY DESIGN (the q132/q170
    // add-batch contract): the staged-base + batch-count merge must
    // reproduce the from-scratch fit bit-for-bit — any count the merge
    // loses or double-adds flips bucket weights and the hash.
    "q185_classifier_add_batch" ->
      s"""WITH $classifierSql
         |SELECT doc_id, source, n_grams, score_micro,
         |  score_micro > 0 AS pred_keep
         |FROM scored ORDER BY score_micro DESC, doc_id LIMIT 100""".stripMargin,
    "q184_classifier_pipeline" ->
      s"""WITH $classifierSql,
         |kept AS (SELECT doc_id, lang, n_tokens FROM scored
         |  WHERE score_micro > 0
         |    AND substring(md5('mix1:' || CAST(doc_id AS VARCHAR)), 1, 8)
         |      < CASE lang
         |        WHEN 'en' THEN '40000000'
         |        WHEN 'de' THEN 'c0000000'
         |        WHEN 'es' THEN 'c0000000'
         |        WHEN 'fr' THEN 'c0000000'
         |        WHEN 'zh' THEN 'ffffffff'
         |        ELSE '00000000' END),
         |c AS (SELECT doc_id, lang, n_tokens,
         |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS cum_tokens
         |  FROM kept)
         |SELECT doc_id, lang, n_tokens, cum_tokens,
         |  CAST(FLOOR((cum_tokens - n_tokens) / 2000.0) AS BIGINT) AS shard_id
         |FROM c ORDER BY doc_id""".stripMargin,
    "q179_dsir_weights" ->
      s"""WITH $gramsSql
         |SELECT doc_id, source, n_grams, weight_micro
         |FROM w ORDER BY weight_micro DESC, doc_id LIMIT 100""".stripMargin,
    "q180_dsir_select" ->
      s"""WITH $gramsSql
         |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COUNT(CASE WHEN w.weight_micro > 0 THEN 1 END) AS BIGINT)
         |    AS n_selected,
         |  COUNT(CASE WHEN w.weight_micro > 0 THEN 1 END) * 10000
         |    // COUNT(*) AS sel_rate_bp,
         |  CAST(COALESCE(SUM(CASE WHEN w.weight_micro > 0
         |    THEN w.weight_micro END), 0) AS BIGINT) AS sel_weight_micro
         |FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id
         |WHERE d.source NOT IN ('src1','src2','src3','src4')
         |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "q181_temperature_mix" ->
      """WITH pl AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(len(list_filter(string_split(text, ' '),
        |      x -> x <> ''))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens FROM pl),
        |wt AS (SELECT lang, n_docs, n_tokens,
        |    CASE WHEN tot_tokens > 0 THEN (n_tokens * 10000) // tot_tokens
        |      ELSE 0 END AS share_bp,
        |    CASE WHEN tot_tokens > 0 THEN CAST(floor(
        |      pow(CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE), 0.3)
        |        * 1e6 + 0.5) AS BIGINT) ELSE 0 END AS w_micro
        |  FROM pl CROSS JOIN tot),
        |ws AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS w_sum FROM wt),
        |r AS (SELECT lang, n_docs, n_tokens, share_bp,
        |    CASE WHEN w_sum > 0 THEN (w_micro * 10000) // w_sum
        |      ELSE 0 END AS rate_bp
        |  FROM wt CROSS JOIN ws)
        |SELECT lang, n_docs, n_tokens, share_bp, rate_bp,
        |  rate_bp * 100000 AS drawn_tokens,
        |  CASE WHEN n_tokens > 0 THEN (rate_bp * 100000 * 1000) // n_tokens
        |    ELSE 0 END AS epochs_milli
        |FROM r ORDER BY lang""".stripMargin)
}
