package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Corpus-assembly operators for a training-data pipeline: deterministic
  * mixture sampling and token-budget shard packing.
  *
  * Both are deliberately built from engine-portable primitives (md5,
  * integer window arithmetic) rather than `rand()` or `sample()`:
  *   - the sampling decision for a row is a pure function of its id, so
  *     it is reproducible across engines, partitionings, task retries,
  *     AND re-runs over a grown corpus (a doc's fate never changes when
  *     its neighbors change — the property `df.sample` lacks);
  *   - that same purity makes both operators fully DuckDB-hash-checkable,
  *     where a PRNG-based sampler could only ever get a rows-only count
  *     check.
  */
object SamplingOps {

  /** Per-language mixture rates: rebalance the corpus by down-sampling
    * over-represented strata (the fixture is ~44% English). A doc is
    * kept iff the first 8 hex chars of md5("mix1:" + doc_id) — a uniform
    * 32-bit value rendered in hex — sort below the stratum's threshold;
    * hex-string comparison at equal length IS numeric comparison, and
    * md5 hex is identical in Spark and DuckDB. */
  val mixtureRates: Seq[(String, String)] = Seq(
    "en" -> "40000000", // keep 25%
    "de" -> "c0000000", // keep 75%
    "es" -> "c0000000",
    "fr" -> "c0000000",
    "zh" -> "ffffffff") // keep ~100%

  private def mixBucket = substring(
    md5(concat(lit("mix1:"), col("doc_id").cast("string"))), 1, 8)

  private def mixThreshold = mixtureRates.foldRight(lit("00000000")) {
    case ((lang, hex), acc) => when(col("lang") === lang, lit(hex)).otherwise(acc)
  }

  /** The q63 deterministic mixture filter over any frame carrying
    * (doc_id, lang) — exposed so composed pipelines (q65's sibling
    * q184) apply the exact same salted-md5 keep-rule. */
  def mixtureFilter(df: DataFrame): DataFrame =
    df.filter(mixBucket < mixThreshold)

  def hashSample(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("hash_bucket", mixBucket)
      .filter(col("hash_bucket") < mixThreshold)
      .select(col("doc_id"), col("lang"), col("source"), col("hash_bucket"))
      .orderBy("doc_id")

  /** The packing transform shared by q64 and q65: given rows with
    * (doc_id, n_tokens, …), append cum_tokens and shard_id — shard id =
    * the doc's cumulative start offset over the budget, in stable
    * doc_id order. The running total rides `Prefix.cumSums` (doc_id is
    * a distinct integral key, so value-range blocks bound every task)
    * — the unpartitioned-window form this replaces funneled the whole
    * corpus through one task, the q110/q115/q116/q91 scale-killer
    * class. Same values, same oracles. */
  def packByBudget(df: DataFrame, budget: Long): DataFrame =
    graft.ops.Prefix.cumSums(df, "doc_id", Seq("n_tokens"))
      .withColumnRenamed("n_tokens_cum", "cum_tokens")
      .withColumn("shard_id",
        ((col("cum_tokens") - col("n_tokens")) / budget).cast("long"))
      .orderBy("doc_id")

  /** Token-budget shard packing over the whole corpus. */
  def shardPack(s: SparkSession, dir: String, budget: Long = 2000L): DataFrame =
    packByBudget(
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(graft.functions.Tokenize.tokens(col("text"))).cast("long").as("n_tokens")),
      budget)

  /** Deterministic stratified top-N: exactly `n` docs per language,
    * chosen uniformly-at-"random" yet reproducibly by ranking each
    * stratum on an md5 key (doc_id tie-break) — the balanced eval-set /
    * few-shot-pool selection step. One shuffle on the stratum key;
    * rank + limit per stratum, no global sort of the corpus. */
  def stratifiedTopN(s: SparkSession, dir: String, n: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("pick_key"), col("doc_id"))
    t(s, dir, "documents")
      .withColumn("pick_key",
        substring(md5(concat(lit("strat1:"), col("doc_id").cast("string"))), 1, 16))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= n)
      .select(col("lang"), col("rk"), col("doc_id"), col("source"))
      .orderBy("lang", "rk")
  }

  /** The full corpus-curation pipeline in one plan — the capstone
    * composition a training-data build actually runs: near-dup CLUSTER
    * dedup (drop every non-canonical cluster member, via anti-join
    * against [[NearDupOps.dupClusters]]), then deterministic mixture
    * sampling, then token-budget shard packing of the survivors. Every
    * stage is a pure function of the input, so the whole pipeline
    * hash-matches one composed DuckDB oracle. */
  def curationPipeline(s: SparkSession, dir: String): DataFrame = {
    val drops = NearDupOps.dupClusters(s, dir)
      .filter(!col("keep")).select("doc_id")
    val kept = t(s, dir, "documents")
      .join(drops, Seq("doc_id"), "left_anti")
      .filter(mixBucket < mixThreshold)
    packByBudget(
      kept.select(col("doc_id"), col("lang"),
        size(graft.functions.Tokenize.tokens(col("text"))).cast("long").as("n_tokens")),
      budget = 2000L)
  }

  /** q193 — the CCNet-ORDERED curation pipeline (q65's sibling with
    * sub-document cleanup as the first stage, the order Wenzek et al.
    * '20 actually run): paragraph-level dedup of the whole corpus
    * (q187 — keep each distinct paragraph's first occurrence, rebuild
    * cleaned text), drop docs whose every paragraph was boilerplate,
    * then DOC-level exact dedup on the CLEANED text (two docs that
    * differed only in already-removed boilerplate collapse here —
    * exactly the catch raw-text dedup misses, and why the order
    * matters), then the q63 deterministic mixture filter and q64
    * token-budget packing of the survivors' CLEANED token counts.
    * Every stage is an already-oracled building block; the composition
    * is one plan under one composed DuckDB oracle.
    *
    * Scale shape: the paragraph stage is q187's min(struct) hash agg
    * (no corpus window); the doc-level collapse keeps ids only through
    * its aggregation (groupBy(digest) → min id → left-semi join back,
    * the q35 rule — cleaned text never rides the collapse shuffle);
    * packing is the `Prefix` two-level scan. */
  def paragraphCuration(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // n_tokens is computed ONCE, at pin time (r16 verdict item 6: the
    // pack tail used to re-run the tokenize kernel over survivor text
    // after the pin had already scanned it) — 8 bytes/row on the pin
    // buys back a whole survivor-corpus kernel pass
    val cleaned = graft.Materialize.stable(
      graft.llm.TextOps.paragraphDedup(docs)
        .filter(col("n_kept") > 0)
        .select(col("doc_id"), col("cleaned_text"),
          size(graft.functions.Tokenize.tokens(col("cleaned_text")))
            .cast("long").as("n_tokens")))
    val keepIds = cleaned
      .select(col("doc_id"), md5(col("cleaned_text")).as("dg"))
      .groupBy("dg").agg(min(col("doc_id")).as("doc_id"))
    val kept = cleaned
      .join(keepIds.select("doc_id"), Seq("doc_id"), "left_semi")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    packByBudget(
      mixtureFilter(kept).select("doc_id", "lang", "n_tokens"),
      budget = 2000L)
  }

  /** q195 — the FULL CCNet+fuzzy curation capstone (VERDICT r14
    * item 2): q193's chain with the MinHash near-dup stage composed in,
    * in the order Wenzek et al. '20 actually run — paragraph-level
    * dedup (q187's min(struct) hash agg, rebuild cleaned text), drop
    * all-boilerplate docs, DOC-level exact dedup on the CLEANED text,
    * then FUZZY dedup of the exact survivors (q43's cascade over the
    * cleaned corpus: band → exact-Jaccard verify ≥ 0.8 → q62's
    * components → keep min-id canonical), then the q63 deterministic
    * mixture filter and q64 token-budget packing of the survivors'
    * CLEANED token counts. Every stage is an already-oracled building
    * block; the composition is one plan under ONE composed DuckDB
    * oracle (brute-force Jaccard + recursive-CTE closure on the oracle
    * side — the q65 pattern — so a pair missed or a cluster member
    * double-kept anywhere in the cascade is a hash mismatch).
    *
    * Scale shape: cleaned text rides only the per-row fused kernel
    * scans (paragraph digesting, banding, shingling); the exact
    * collapse, band join, candidate verify, components, and the final
    * anti-joins all shuffle ids/digests only ([[NearDupOps.fuzzyDropIds]]);
    * packing is the `Prefix` two-level scan. The exact-dup collapse
    * BEFORE banding is the cascade's usual pre-collapse discipline —
    * here it falls out of the CCNet order for free. */
  def fullCuration(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // ONE text-carrying pin for the whole cascade (r15 verdict item 6
    // — the first cut pinned survivor text TWICE: once here and once
    // as a separate survivors checkpoint). The exact-dup digest is
    // folded into this pin so the keep decision and both survivor
    // consumers (the fuzzy cascade, the pack tail) all read the same
    // single materialization. Storage posture: localCheckpoint pins at
    // MEMORY_AND_DISK, so the frame — bounded by paragraph-dedup
    // survivor count × document size — SPILLS rather than OOMs when
    // the cleaned corpus outgrows executor memory; the ScaleSoak
    // full_curation decades record the bound holding at 500k docs.
    // n_tokens rides the pin too (r16 verdict item 6): the pack tail
    // used to re-run the tokenize kernel over survivor cleaned text
    // after this pin had already scanned every byte of it — one
    // 8-byte column removes that whole second kernel pass
    val cleaned = graft.Materialize.stable(
      graft.llm.TextOps.paragraphDedup(docs)
        .filter(col("n_kept") > 0)
        .select(col("doc_id"), col("cleaned_text"),
          md5(col("cleaned_text")).as("dg"),
          size(graft.functions.Tokenize.tokens(col("cleaned_text")))
            .cast("long").as("n_tokens")))
    // ids-only (16-byte digest + id) pin: both survivor references
    // re-join through it without re-running the keep aggregation
    val keepIds = graft.Materialize.stable(
      cleaned.groupBy("dg").agg(min(col("doc_id")).as("doc_id")))
    val survivors = cleaned
      .join(keepIds.select("doc_id"), Seq("doc_id"), "left_semi")
    val fuzzyDrops = NearDupOps.fuzzyDropIds(
      survivors.select(col("doc_id"), col("cleaned_text").as("text")))
    val kept = survivors
      .join(fuzzyDrops, Seq("doc_id"), "left_anti")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    packByBudget(
      mixtureFilter(kept).select("doc_id", "lang", "n_tokens"),
      budget = 2000L)
  }

  /** q178 — concat-and-chunk sequence packing: the pretraining
    * data-loader op q64 deliberately is NOT. q64 packs WHOLE documents
    * into token-budget shards; the GPT-style loader instead
    * concatenates the corpus in stable doc_id order (separator-free
    * here; an EOS would just add +1 per doc) and slices it into
    * fixed-length examples of C tokens, SPLITTING documents across
    * example boundaries. The output is one row per (example, document)
    * overlap span — exactly the index a loader needs to assemble
    * example i by reading its member docs' token sub-ranges, and the
    * provenance map needed to trace any training example back to its
    * source documents.
    *
    * Plan: token counts per doc (fused-kernel scan), the q64 prefix
    * scan for global offsets (block-bounded tasks, no corpus-sized
    * window), then `explode(sequence(first_ex, last_ex))` — pure
    * per-row arithmetic whose fan-out is n_tokens/C + 1 rows per doc,
    * so output rows ≈ n_docs + total_tokens/C: linear, and nothing
    * after the prefix scan shuffles at all. Every value is exact
    * BIGINT arithmetic (integer div, greatest/least), so the DuckDB
    * twin hash-matches. */
  def sequenceChunks(s: SparkSession, dir: String, c: Long = 512L): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"),
        size(graft.functions.Tokenize.tokens(col("text"))).cast("long")
          .as("n_tokens"))
      .filter(col("n_tokens") > 0)
    graft.ops.Prefix.cumSums(toks, "doc_id", Seq("n_tokens"))
      .withColumn("start_tok", col("n_tokens_cum") - col("n_tokens"))
      .withColumn("end_tok", col("n_tokens_cum"))
      .withColumn("example_id", explode(sequence(
        expr(s"start_tok div $c"), expr(s"(end_tok - 1) div $c"))))
      .select(col("example_id"), col("doc_id"),
        greatest(col("start_tok"), col("example_id") * c).as("span_start"),
        least(col("end_tok"), (col("example_id") + 1) * c).as("span_end"))
      .withColumn("span_tokens", col("span_end") - col("span_start"))
      .orderBy("example_id", "doc_id")
  }

  /** Importance-weighted Bernoulli (Poisson) downsampling: each doc is
    * kept independently with probability proportional to its weight —
    * here length, p = min(1, n_chars/400), the "prefer substantive
    * documents" gate of a quality-weighted mixture (the per-item form of
    * temperature/quality reweighting; DoReMi-style pipelines apply
    * exactly this shape with a learned weight).
    *
    * Like q63, the decision is a pure function of the row: the keep
    * threshold is p·2³² computed in exact integer arithmetic (the
    * numerator n_chars·2³² is < 2⁵³ so the one double division is
    * correctly rounded in both engines, and the quotient is ≥ 1/400 from
    * any integer, so floor is unambiguous), rendered as 8 hex digits and
    * compared against the doc's uniform md5 bucket — string compare at
    * equal length IS the numeric compare. Per-row, no shuffle,
    * reproducible under retries and corpus growth. */
  def weightedSample(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("hash_bucket", substring(
        md5(concat(lit("wsamp1:"), col("doc_id").cast("string"))), 1, 8))
      .withColumn("keep_thr", lower(lpad(conv(
        least(floor(col("n_chars") * lit(4294967296L) / 400), lit(4294967295L))
          .cast("long").cast("string"), 10, 16), 8, "0")))
      .filter(col("hash_bucket") < col("keep_thr"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("hash_bucket"), col("keep_thr"))
      .orderBy("doc_id")

  /** Deterministic train/val/test split — the hash-bucket holdout rule
    * every training-data build needs: 90/5/5 by the first 8 hex chars of
    * a salted md5 of the doc id. A doc's split NEVER changes when the
    * corpus grows or is re-partitioned (the property a `rand()` split
    * lacks), which is what makes the val/test sets stable across
    * pipeline re-runs — the same determinism argument as q63, applied to
    * the holdout boundary. Per-row, no shuffle. */
  def splitAssign(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("hash_bucket", substring(
        md5(concat(lit("split1:"), col("doc_id").cast("string"))), 1, 8))
      .withColumn("split",
        when(col("hash_bucket") < "e6666666", "train")
          .when(col("hash_bucket") < "f3333333", "val")
          .otherwise("test"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("hash_bucket"), col("split"))
      .orderBy("doc_id")

  /** q172 — cluster-aware split assignment: the REMEDIATION for the
    * leakage q126 measures. q97's hash-bucket holdout salts each doc's
    * OWN id, so two near-identical documents can land in train and test
    * — exactly the contamination a dedup-aware pipeline must prevent.
    * Here every member of a q62 near-dup cluster inherits the split of
    * its cluster id instead: the bucket is md5-salted on `cluster_id`,
    * so a cluster moves as a unit and a near-dup pair can NEVER
    * straddle the holdout boundary (pinned in SamplingSpec against the
    * exact-Jaccard pair list). Unclustered docs coalesce to their own
    * id with the SAME salt as q97 — singletons keep their q97 split, so
    * adopting cluster-aware splits only ever moves clustered docs.
    *
    * Plan: the q62 component labels (narrow id frame, rides the staged
    * band index) left-joined onto the corpus; the split itself is
    * per-row md5 arithmetic, no extra shuffle. */
  def clusterSplitAssign(s: SparkSession, dir: String): DataFrame = {
    val labels = NearDupOps.dupClusters(s, dir)
      .select(col("doc_id"), col("cluster_id"))
    t(s, dir, "documents")
      .join(labels, Seq("doc_id"), "left_outer")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("hash_bucket", substring(
        md5(concat(lit("split1:"), col("cluster_id").cast("string"))), 1, 8))
      .withColumn("split",
        when(col("hash_bucket") < "e6666666", "train")
          .when(col("hash_bucket") < "f3333333", "val")
          .otherwise("test"))
      .select(col("doc_id"), col("cluster_id"), col("source"),
        col("hash_bucket"), col("split"))
      .orderBy("doc_id")
  }

  /** q174 — holdout balance audit: the source × split contingency table
    * a curation run checks before trusting its eval sets. For every
    * (source, split) cell after cluster-aware assignment (q172): doc
    * and token counts, the split's share WITHIN the source, and the
    * deviation from that split's corpus-wide share — a source whose
    * val/test share deviates far from global is either tiny (noise) or
    * systematically entangled with near-dup clusters, and its eval
    * numbers should not be trusted.
    *
    * Determinism: counts exact; each share is one double division of
    * exact longs rounded 6dp; deviation subtracts two already-rounded
    * doubles (identical fp ops both engines).
    *
    * Plan: q172's frame (dup clusters ride the session memo; the split
    * is per-row arithmetic) + one tokenize aggregation keyed on
    * (source, split) — |sources|·3 rows out regardless of corpus
    * size. */
  def holdoutBalance(s: SparkSession, dir: String): DataFrame = {
    val splits = clusterSplitAssign(s, dir).select("doc_id", "source", "split")
    val toks = t(s, dir, "documents")
      .select(col("doc_id"),
        size(graft.functions.Tokenize.tokens(col("text"))).cast("long").as("toks"))
    // Materialized (the q109 rule): three downstream branches
    // (perSource, global, the final join spine) each re-derive the
    // split assignment + corpus tokenize without it.
    val cells = graft.Materialize.stable(splits.join(toks, Seq("doc_id"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens")))
    val perSource = cells.groupBy("source")
      .agg(sum(col("n_docs")).as("src_docs"))
    val global = cells.groupBy("split")
      .agg(sum(col("n_docs")).as("split_docs"))
      .crossJoin(broadcast(cells.agg(sum(col("n_docs")).as("all_docs"))))
      .select(col("split"),
        round(col("split_docs").cast("double") / col("all_docs"), 6)
          .as("global_share"))
    cells.join(perSource, Seq("source")).join(broadcast(global), Seq("split"))
      .select(col("source"), col("split"), col("n_docs"), col("n_tokens"),
        round(col("n_docs").cast("double") / col("src_docs"), 6).as("src_share"),
        col("global_share"))
      .withColumn("deviation",
        round(col("src_share") - col("global_share"), 6))
      .orderBy("source", "split")
  }

  /** q143 — token-budget allocator: turn a temperature-weighted mixture
    * (the q82 shape, computed over TOKENS rather than doc counts) into
    * the numbers a sampling run actually executes: per source, the
    * available token supply, the target token allocation for a total
    * budget B, the keep-rate (capped at 1 — this allocator never
    * up-samples), and the epoch factor (>1 flags a source the mixture
    * wants MORE of than exists — the practical signal to either repeat
    * the source or renormalize).
    *
    * Determinism: supply counts are exact integers; weight and target
    * are each ONE double expression (sqrt / ordered-sum z / floor) both
    * engines evaluate identically (the q82 contract), so `floor(B·w)`
    * is an exact bigint in both.
    *
    * Plan: one tokenize+count aggregation over the corpus (map-side
    * partials — the per-row token count never leaves the scan stage);
    * everything downstream is |sources|-row broadcast arithmetic. */
  def tokenBudget(s: SparkSession, dir: String, budget: Long = 500000L): DataFrame = {
    // Materialized (the q109 rule): the normalizer and the final
    // projection both consume this |sources|-row frame; without the
    // checkpoint the corpus is TOKENIZED once per branch.
    val avail = graft.Materialize.stable(t(s, dir, "documents")
      .select(col("source"),
        size(graft.functions.Tokenize.tokens(col("text"))).cast("long").as("toks"))
      .groupBy("source").agg(sum(col("toks")).as("avail_tokens")))
    val z = avail
      .agg(sort_array(collect_list(sqrt(col("avail_tokens").cast("double")))).as("zs"))
      .select(aggregate(col("zs"), lit(0.0), _ + _).as("z"))
    avail.crossJoin(broadcast(z))
      .select(col("source"), col("avail_tokens"),
        round(sqrt(col("avail_tokens").cast("double")) / col("z"), 6).as("weight"),
        floor(lit(budget.toDouble) * (sqrt(col("avail_tokens").cast("double")) / col("z")))
          .cast("long").as("target_tokens"))
      .withColumn("keep_rate", round(least(lit(1.0),
        col("target_tokens").cast("double") / col("avail_tokens")), 6))
      .withColumn("epochs", round(
        col("target_tokens").cast("double") / col("avail_tokens"), 4))
      .orderBy("source")
  }


  /** q161 — the q143 allocator computed on DEDUPED supply: identical
    * temperature formula, but the per-source token pool counts each
    * q62 near-dup cluster ONCE (the q147 canonical rule). The pair
    * (q143, q161) is the before/after of dedup-aware budgeting — a
    * source whose weight drops between the two is padding its size
    * with duplicates, and q161's numbers are the ones a curation run
    * should execute.
    *
    * Plan: q147's narrow label join + one aggregate, then |sources|-row
    * broadcast arithmetic (the q143 tail verbatim). */
  def effectiveBudget(s: SparkSession, dir: String, budget: Long = 500000L): DataFrame = {
    val labels = NearDupOps.dupClusters(s, dir)
      .select(col("doc_id"), col("cluster_id"))
    // Materialized (the q109 rule, as in tokenBudget): both consumers
    // would otherwise re-run the corpus tokenize AND the dup-cluster
    // label join.
    val avail = graft.Materialize.stable(t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(graft.functions.Tokenize.tokens(col("text"))).cast("long").as("toks"))
      .join(labels, Seq("doc_id"), "left_outer")
      .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      .groupBy("source").agg(sum(col("toks")).as("eff_tokens")))
    val z = avail
      .agg(sort_array(collect_list(sqrt(col("eff_tokens").cast("double")))).as("zs"))
      .select(aggregate(col("zs"), lit(0.0), _ + _).as("z"))
    avail.crossJoin(broadcast(z))
      .select(col("source"), col("eff_tokens"),
        round(sqrt(col("eff_tokens").cast("double")) / col("z"), 6).as("weight"),
        floor(lit(budget.toDouble) * (sqrt(col("eff_tokens").cast("double")) / col("z")))
          .cast("long").as("target_tokens"))
      .withColumn("keep_rate", round(least(lit(1.0),
        col("target_tokens").cast("double") / col("eff_tokens")), 6))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q161_effective_budget" -> ((s, dir) => effectiveBudget(s, dir)),
    "q63_hash_sample" -> hashSample,
    "q64_shard_pack"  -> ((s, dir) => shardPack(s, dir)),
    "q65_curation_pipeline" -> curationPipeline,
    "q193_paragraph_curation" -> paragraphCuration,
    "q195_full_curation" -> fullCuration,
    "q66_stratified_topn" -> ((s, dir) => stratifiedTopN(s, dir)),
    "q94_weighted_sample" -> weightedSample,
    "q97_split_assign" -> splitAssign,
    "q172_cluster_split_assign" -> clusterSplitAssign,
    "q174_holdout_balance" -> holdoutBalance,
    "q143_token_budget" -> ((s, dir) => tokenBudget(s, dir)),
    "q178_sequence_chunks" -> ((s, dir) => sequenceChunks(s, dir)))

  val oracleSql: Map[String, String] = Map(
    // q174: q172's cluster-split CTE + the (source, split) contingency.
    "q174_holdout_balance" ->
      """WITH RECURSIVE
        |docsh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tk) < 3 THEN []
        |      ELSE list_transform(generate_series(1, len(tk) - 2),
        |           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END) AS sh
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |        FROM documents)),
        |nonempty AS (SELECT doc_id, sh FROM docsh WHERE len(sh) > 0),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM nonempty),
        |ex AS (SELECT doc_id, unnest(sh) AS shingle FROM nonempty),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
        |labels AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
        |allv AS (
        |  SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id, d.source,
        |    CAST(len(list_filter(string_split(d.text, ' '), x -> x <> '')) AS BIGINT) AS toks
        |  FROM documents d LEFT JOIN labels l USING (doc_id)),
        |sp AS (SELECT doc_id, source, toks,
        |         CASE WHEN substr(md5('split1:' || CAST(cluster_id AS VARCHAR)), 1, 8)
        |                < 'e6666666' THEN 'train'
        |              WHEN substr(md5('split1:' || CAST(cluster_id AS VARCHAR)), 1, 8)
        |                < 'f3333333' THEN 'val'
        |              ELSE 'test' END AS split
        |       FROM allv),
        |cells AS (SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |            CAST(SUM(toks) AS BIGINT) AS n_tokens
        |          FROM sp GROUP BY 1, 2),
        |per_source AS (SELECT source, CAST(SUM(n_docs) AS BIGINT) AS src_docs
        |               FROM cells GROUP BY 1),
        |gl AS (SELECT split, round(CAST(SUM(n_docs) AS DOUBLE)
        |         / (SELECT SUM(n_docs) FROM cells), 6) AS global_share
        |       FROM cells GROUP BY 1)
        |SELECT source, split, n_docs, n_tokens,
        |  round(CAST(n_docs AS DOUBLE) / src_docs, 6) AS src_share,
        |  global_share,
        |  round(round(CAST(n_docs AS DOUBLE) / src_docs, 6) - global_share, 6)
        |    AS deviation
        |FROM cells JOIN per_source USING (source) JOIN gl USING (split)
        |ORDER BY source, split""".stripMargin,
    // q172: q62's component CTE (same shingle/jaccard/star contract)
    // with the q97 split rule keyed on the cluster id; singletons
    // coalesce to their own id under the same salt.
    "q172_cluster_split_assign" ->
      """WITH RECURSIVE
        |docsh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tk) < 3 THEN []
        |      ELSE list_transform(generate_series(1, len(tk) - 2),
        |           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END) AS sh
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |        FROM documents)),
        |nonempty AS (SELECT doc_id, sh FROM docsh WHERE len(sh) > 0),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM nonempty),
        |ex AS (SELECT doc_id, unnest(sh) AS shingle FROM nonempty),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
        |labels AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
        |allv AS (
        |  SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id, d.source
        |  FROM documents d LEFT JOIN labels l USING (doc_id)),
        |sp AS (SELECT doc_id, cluster_id, source,
        |         substr(md5('split1:' || CAST(cluster_id AS VARCHAR)), 1, 8) AS hash_bucket
        |       FROM allv)
        |SELECT doc_id, cluster_id, source, hash_bucket,
        |  CASE WHEN hash_bucket < 'e6666666' THEN 'train'
        |       WHEN hash_bucket < 'f3333333' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM sp ORDER BY doc_id""".stripMargin,
    "q161_effective_budget" ->
      """WITH RECURSIVE
        |docsh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tk) < 3 THEN []
        |      ELSE list_transform(generate_series(1, len(tk) - 2),
        |           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END) AS sh
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |        FROM documents)),
        |nonempty AS (SELECT doc_id, sh FROM docsh WHERE len(sh) > 0),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM nonempty),
        |ex AS (SELECT doc_id, unnest(sh) AS shingle FROM nonempty),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
        |labels AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
        |a AS (SELECT source,
        |    CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
        |      AS BIGINT) AS eff_tokens
        |  FROM documents d LEFT JOIN labels l USING (doc_id)
        |  WHERE l.cluster_id IS NULL OR l.cluster_id = d.doc_id
        |  GROUP BY 1),
        |tot AS (SELECT list_sum(list(sqrt(CAST(eff_tokens AS DOUBLE))
        |    ORDER BY sqrt(CAST(eff_tokens AS DOUBLE)))) AS z FROM a)
        |SELECT source, eff_tokens,
        |  round(sqrt(CAST(eff_tokens AS DOUBLE)) / z, 6) AS weight,
        |  CAST(floor(500000.0 * (sqrt(CAST(eff_tokens AS DOUBLE)) / z))
        |    AS BIGINT) AS target_tokens,
        |  round(least(CAST(1 AS DOUBLE),
        |    CAST(CAST(floor(500000.0 * (sqrt(CAST(eff_tokens AS DOUBLE)) / z))
        |      AS BIGINT) AS DOUBLE) / eff_tokens), 6) AS keep_rate
        |FROM a CROSS JOIN tot ORDER BY source""".stripMargin,

    "q143_token_budget" ->
      """WITH a AS (SELECT source,
        |    CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
        |      AS BIGINT) AS avail_tokens
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT list_sum(list(sqrt(CAST(avail_tokens AS DOUBLE))
        |    ORDER BY sqrt(CAST(avail_tokens AS DOUBLE)))) AS z FROM a)
        |SELECT source, avail_tokens,
        |  round(sqrt(CAST(avail_tokens AS DOUBLE)) / z, 6) AS weight,
        |  CAST(floor(500000.0 * (sqrt(CAST(avail_tokens AS DOUBLE)) / z))
        |    AS BIGINT) AS target_tokens,
        |  round(least(CAST(1 AS DOUBLE),
        |    CAST(CAST(floor(500000.0 * (sqrt(CAST(avail_tokens AS DOUBLE)) / z))
        |      AS BIGINT) AS DOUBLE) / avail_tokens), 6) AS keep_rate,
        |  round(CAST(CAST(floor(500000.0 * (sqrt(CAST(avail_tokens AS DOUBLE)) / z))
        |      AS BIGINT) AS DOUBLE) / avail_tokens, 4) AS epochs
        |FROM a CROSS JOIN tot ORDER BY source""".stripMargin,
    "q94_weighted_sample" ->
      """WITH b AS (
        |  SELECT doc_id, source, n_chars,
        |    substring(md5('wsamp1:' || CAST(doc_id AS VARCHAR)), 1, 8) AS hash_bucket,
        |    lower(lpad(to_hex(CAST(least(
        |      floor(n_chars * 4294967296 / 400), 4294967295) AS BIGINT)),
        |      8, '0')) AS keep_thr
        |  FROM documents)
        |SELECT doc_id, source, n_chars, hash_bucket, keep_thr
        |FROM b WHERE hash_bucket < keep_thr
        |ORDER BY doc_id""".stripMargin,
    "q97_split_assign" ->
      """WITH b AS (
        |  SELECT doc_id, lang, source,
        |    substring(md5('split1:' || CAST(doc_id AS VARCHAR)), 1, 8) AS hash_bucket
        |  FROM documents)
        |SELECT doc_id, lang, source, hash_bucket,
        |  CASE WHEN hash_bucket < 'e6666666' THEN 'train'
        |       WHEN hash_bucket < 'f3333333' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b
        |ORDER BY doc_id""".stripMargin,
    "q66_stratified_topn" ->
      """WITH ranked AS (
        |  SELECT lang, doc_id, source,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY substring(md5('strat1:' || CAST(doc_id AS VARCHAR)), 1, 16),
        |               doc_id) AS rk
        |  FROM documents)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, source
        |FROM ranked WHERE rk <= 10
        |ORDER BY lang, rk""".stripMargin,
    // q193: q187's paragraph stage (ROW_NUMBER form — the oracle may
    // single-partition, the plan must not), doc-level collapse on the
    // cleaned text, the q63 mixture CASE, the q64/q65 packing window.
    "q193_paragraph_curation" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |pl AS (
        |  SELECT doc_id, list_transform(
        |      generate_series(0, CAST(ceil(len(toks) / 10.0) AS BIGINT) - 1),
        |      i -> array_to_string(list_slice(toks, i*10+1, i*10+10), ' ')) AS ps
        |  FROM tk),
        |paras AS (
        |  SELECT doc_id, unnest(ps) AS para,
        |    unnest(generate_series(0, len(ps) - 1)) AS para_idx
        |  FROM pl),
        |marked AS (
        |  SELECT doc_id, para_idx, para,
        |    ROW_NUMBER() OVER (PARTITION BY md5(para)
        |                       ORDER BY doc_id, para_idx) = 1 AS is_first
        |  FROM paras),
        |stats AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN is_first THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |    COALESCE(string_agg(para, ' ' ORDER BY para_idx)
        |             FILTER (WHERE is_first), '') AS cleaned_text
        |  FROM marked GROUP BY doc_id),
        |cleaned AS (SELECT doc_id, cleaned_text FROM stats WHERE n_kept > 0),
        |reps AS (SELECT md5(cleaned_text) AS dg, MIN(doc_id) AS rep
        |         FROM cleaned GROUP BY 1),
        |kept AS (
        |  SELECT c.doc_id, d.lang, c.cleaned_text
        |  FROM cleaned c
        |  JOIN reps r ON md5(c.cleaned_text) = r.dg AND c.doc_id = r.rep
        |  JOIN documents d ON d.doc_id = c.doc_id
        |  WHERE substring(md5('mix1:' || CAST(c.doc_id AS VARCHAR)), 1, 8) < CASE d.lang
        |    WHEN 'en' THEN '40000000'
        |    WHEN 'de' THEN 'c0000000'
        |    WHEN 'es' THEN 'c0000000'
        |    WHEN 'fr' THEN 'c0000000'
        |    WHEN 'zh' THEN 'ffffffff'
        |    ELSE '00000000' END),
        |tk2 AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split(cleaned_text, ' '), x -> x <> ''))
        |      AS BIGINT) AS n_tokens
        |  FROM kept),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum_tokens
        |  FROM tk2)
        |SELECT doc_id, lang, n_tokens, cum_tokens,
        |  CAST(FLOOR((cum_tokens - n_tokens) / 2000.0) AS BIGINT) AS shard_id
        |FROM c
        |ORDER BY doc_id""".stripMargin,
    // q195: q193's paragraph + exact-collapse chain, then q65's
    // brute-force Jaccard + recursive closure on the CLEANED survivor
    // texts (the oracle for the banded cascade), then mixture + pack.
    "q195_full_curation" ->
      """WITH RECURSIVE
        |tk AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |pl AS (
        |  SELECT doc_id, list_transform(
        |      generate_series(0, CAST(ceil(len(toks) / 10.0) AS BIGINT) - 1),
        |      i -> array_to_string(list_slice(toks, i*10+1, i*10+10), ' ')) AS ps
        |  FROM tk),
        |paras AS (
        |  SELECT doc_id, unnest(ps) AS para,
        |    unnest(generate_series(0, len(ps) - 1)) AS para_idx
        |  FROM pl),
        |marked AS (
        |  SELECT doc_id, para_idx, para,
        |    ROW_NUMBER() OVER (PARTITION BY md5(para)
        |                       ORDER BY doc_id, para_idx) = 1 AS is_first
        |  FROM paras),
        |stats AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN is_first THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |    COALESCE(string_agg(para, ' ' ORDER BY para_idx)
        |             FILTER (WHERE is_first), '') AS cleaned_text
        |  FROM marked GROUP BY doc_id),
        |cleaned AS (SELECT doc_id, cleaned_text FROM stats WHERE n_kept > 0),
        |reps AS (SELECT md5(cleaned_text) AS dg, MIN(doc_id) AS rep
        |         FROM cleaned GROUP BY 1),
        |surv AS (
        |  SELECT c.doc_id, c.cleaned_text
        |  FROM cleaned c
        |  JOIN reps r ON md5(c.cleaned_text) = r.dg AND c.doc_id = r.rep),
        |docsh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(ct) < 3 THEN []
        |      ELSE list_transform(generate_series(1, len(ct) - 2),
        |           i -> ct[i] || ' ' || ct[i+1] || ' ' || ct[i+2]) END) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(string_split(cleaned_text, ' '), x -> x <> '') AS ct
        |        FROM surv)),
        |nonempty AS (SELECT doc_id, sh FROM docsh WHERE len(sh) > 0),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM nonempty),
        |ex AS (SELECT doc_id, unnest(sh) AS shingle FROM nonempty),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
        |labels AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
        |drops AS (SELECT doc_id FROM labels WHERE doc_id <> cluster_id),
        |kept AS (
        |  SELECT v.doc_id, d.lang, v.cleaned_text
        |  FROM surv v
        |  JOIN documents d ON d.doc_id = v.doc_id
        |  WHERE v.doc_id NOT IN (SELECT doc_id FROM drops)
        |    AND substring(md5('mix1:' || CAST(v.doc_id AS VARCHAR)), 1, 8) < CASE d.lang
        |      WHEN 'en' THEN '40000000'
        |      WHEN 'de' THEN 'c0000000'
        |      WHEN 'es' THEN 'c0000000'
        |      WHEN 'fr' THEN 'c0000000'
        |      WHEN 'zh' THEN 'ffffffff'
        |      ELSE '00000000' END),
        |tk2 AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split(cleaned_text, ' '), x -> x <> ''))
        |      AS BIGINT) AS n_tokens
        |  FROM kept),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum_tokens
        |  FROM tk2)
        |SELECT doc_id, lang, n_tokens, cum_tokens,
        |  CAST(FLOOR((cum_tokens - n_tokens) / 2000.0) AS BIGINT) AS shard_id
        |FROM c
        |ORDER BY doc_id""".stripMargin,
    "q65_curation_pipeline" ->
      """WITH RECURSIVE
        |docsh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tk) < 3 THEN []
        |      ELSE list_transform(generate_series(1, len(tk) - 2),
        |           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END) AS sh
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |        FROM documents)),
        |nonempty AS (SELECT doc_id, sh FROM docsh WHERE len(sh) > 0),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM nonempty),
        |ex AS (SELECT doc_id, unnest(sh) AS shingle FROM nonempty),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
        |labels AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
        |drops AS (SELECT doc_id FROM labels WHERE doc_id <> cluster_id),
        |kept AS (
        |  SELECT d.doc_id, d.lang, d.text FROM documents d
        |  WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
        |    AND substring(md5('mix1:' || CAST(d.doc_id AS VARCHAR)), 1, 8) < CASE d.lang
        |      WHEN 'en' THEN '40000000'
        |      WHEN 'de' THEN 'c0000000'
        |      WHEN 'es' THEN 'c0000000'
        |      WHEN 'fr' THEN 'c0000000'
        |      WHEN 'zh' THEN 'ffffffff'
        |      ELSE '00000000' END),
        |tk AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
        |      AS n_tokens
        |  FROM kept),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum_tokens
        |  FROM tk)
        |SELECT doc_id, lang, n_tokens, cum_tokens,
        |  CAST(FLOOR((cum_tokens - n_tokens) / 2000.0) AS BIGINT) AS shard_id
        |FROM c
        |ORDER BY doc_id""".stripMargin,
    "q63_hash_sample" ->
      """WITH b AS (
        |  SELECT doc_id, lang, source,
        |    substring(md5('mix1:' || CAST(doc_id AS VARCHAR)), 1, 8) AS hash_bucket
        |  FROM documents)
        |SELECT doc_id, lang, source, hash_bucket
        |FROM b
        |WHERE hash_bucket < CASE lang
        |  WHEN 'en' THEN '40000000'
        |  WHEN 'de' THEN 'c0000000'
        |  WHEN 'es' THEN 'c0000000'
        |  WHEN 'fr' THEN 'c0000000'
        |  WHEN 'zh' THEN 'ffffffff'
        |  ELSE '00000000' END
        |ORDER BY doc_id""".stripMargin,
    "q64_shard_pack" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum_tokens
        |  FROM tk)
        |SELECT doc_id, n_tokens, cum_tokens,
        |  CAST(FLOOR((cum_tokens - n_tokens) / 2000.0) AS BIGINT) AS shard_id
        |FROM c
        |ORDER BY doc_id""".stripMargin,
    // q178: q64's token-count + running-offset CTEs, then inclusive
    // integer-division example spans via generate_series — all-BIGINT
    // arithmetic, exact in both engines.
    "q178_sequence_chunks" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum_tokens
        |  FROM tk WHERE n_tokens > 0),
        |sp AS (
        |  SELECT doc_id, cum_tokens - n_tokens AS start_tok,
        |    cum_tokens AS end_tok
        |  FROM c),
        |ex AS (
        |  SELECT doc_id, start_tok, end_tok,
        |    unnest(generate_series(start_tok // 512, (end_tok - 1) // 512))
        |      AS example_id
        |  FROM sp)
        |SELECT example_id, doc_id,
        |  GREATEST(start_tok, example_id * 512) AS span_start,
        |  LEAST(end_tok, (example_id + 1) * 512) AS span_end,
        |  LEAST(end_tok, (example_id + 1) * 512)
        |    - GREATEST(start_tok, example_id * 512) AS span_tokens
        |FROM ex
        |ORDER BY example_id, doc_id""".stripMargin)
}
