package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Corpus-audit operators, round 4: collocation mining (PMI),
  * source-term affinity, schema-evolution ingest, and the dedup growth
  * curve. The reports a corpus builder runs BETWEEN pipeline stages to
  * decide what to fix next — all pure aggregation arithmetic over the
  * token/digest tables the other llm operators already stage, so every
  * one carries a full DuckDB hash oracle.
  *
  * Float posture (the q95 rule): every logarithm is taken on ONE double
  * ratio assembled from exact integer counts by a fixed sequence of IEEE
  * products/divisions — both engines evaluate the identical expression
  * tree — then rounded to 4dp before any ranking.
  */
object CorpusAudit {

  private def tokens(c: org.apache.spark.sql.Column) =
    graft.functions.Tokenize.tokens(c)

  /** Collocation mining by pointwise mutual information (Church & Hanks
    * 1990): PMI(w₁,w₂) = ln(p(w₁w₂) / (p(w₁)p(w₂))) over adjacent token
    * pairs, min support 25 occurrences, top-20 by (rounded PMI, pair).
    * High-PMI pairs are the multi-word units a tokenizer or phrase
    * miner should treat as one symbol — the statistical step behind
    * merge rules that q89's raw pair counts only rank by frequency.
    *
    * Plan: ONE corpus-sized pair aggregation (q89's map-side zip_with
    * emission) + one unigram aggregation re-read from the same scan;
    * the probability arithmetic joins pair rows to two broadcastable
    * unigram sides on the exchanges the counts already made (AQE
    * decides, the q80 posture); top-20 plans as TakeOrderedAndProject. */
  def pmiCollocations(s: SparkSession, dir: String, minCount: Long = 25L): DataFrame = {
    val tk = tokens(col("text"))
    val toks = graft.Tables.tSpread(s, dir, "documents")
      .select(col("doc_id"), tk.as("tk"))
    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val n1 = uni.agg(sum(col("c")).as("n1"))
    // n2 is the TOTAL bigram count — computed before the support filter,
    // so p(w1w2) is a real probability, not one renormalized over the
    // surviving pairs.
    // Fused (optimization r18): adjacent pairs ride the token_bigrams
    // kernel (q89/q95's emission) instead of an interpreted zip_with
    // lambda per pair; explode of an empty array drops <2-token docs.
    val pairsAll = graft.Tables.tSpread(s, dir, "documents")
      .select(explode(
        graft.functions.HashKernels.token_bigrams(col("text"))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
    val n2 = pairsAll.agg(sum(col("c12")).as("n2"))
    pairsAll
      .filter(col("c12") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .withColumn("pmi",
        round(log((col("c12").cast("double") / col("n2"))
          / ((col("c1").cast("double") / col("n1"))
            * (col("c2").cast("double") / col("n1")))), 4))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"), col("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** Source-term affinity — the "distinctive vocabulary per source"
    * report (the relative-frequency-ratio / source-level PMI form of
    * Monroe et al. 2008's fightin'-words question): score(s,t) =
    * ln((c_st/C_s) / (c_t/C)), the log of how over-represented term t
    * is in source s vs the whole corpus. Top-3 per source at min
    * support 20, ranked on the 4dp-rounded score with term tie-break
    * (the q80 determinism rule).
    *
    * Plan: one (source, term) aggregation is the corpus shuffle; term
    * totals re-aggregate it (narrow); source totals and the corpus
    * total are broadcast scalars; the top-3 window partitions by
    * source. */
  def sourceTermAffinity(s: SparkSession, dir: String, minCount: Long = 20L): DataFrame = {
    val st = graft.Materialize.stable(
      graft.Tables.tSpread(s, dir, "documents")
        .select(col("source"), explode(tokens(col("text"))).as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("c_st")))
    val termTot = st.groupBy("term").agg(sum(col("c_st")).as("c_t"))
    val srcTot = st.groupBy("source").agg(sum(col("c_st")).as("c_s"))
    val tot = st.agg(sum(col("c_st")).as("c_all"))
    val w = Window.partitionBy("source")
      .orderBy(col("score").desc, col("term"))
    st.filter(col("c_st") >= minCount)
      .join(termTot, Seq("term"))
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("score",
        round(log((col("c_st").cast("double") / col("c_s"))
          / (col("c_t").cast("double") / col("c_all"))), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("source", "rank", "term", "c_st", "c_t", "score")
      .orderBy("source", "rank")
  }

  /** Schema-evolution ingest — union a legacy snapshot that PREDATES two
    * columns (no lang, no n_chars) with the current table, by column
    * NAME with null fill (`unionByName(allowMissingColumns)`), then
    * profile the merged corpus. The everyday warehouse reality the
    * strict schema gate (Schemas.validateOnce) exists to catch — this
    * operator is the sanctioned path: evolution happens at UNION time
    * with explicit null semantics, not by loosening the per-file gate.
    * The legacy snapshot is the q88 fixture rule (doc_id % 5 ≠ 4,
    * 120-char truncation) shifted to ids 100000+, so provenance is
    * disjoint. Per-row, one rollup — no scale caveats. */
  def schemaUnion(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val legacy = docs.filter(col("doc_id") % 5 =!= 4)
      .select((col("doc_id") + 100000L).as("doc_id"),
        substring(col("text"), 1, 120).as("text"),
        col("source"))
    val merged = docs.unionByName(legacy, allowMissingColumns = true)
    merged.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_legacy"),
        sum(coalesce(col("n_chars"), lit(-1L))).as("sum_chars_sentinel"),
        count(col("n_chars")).as("n_with_chars"))
      .orderBy("source")
  }

  /** Dedup growth curve — cumulative exact-duplicate fraction as the
    * corpus is ingested in doc_id order, one row per 50-doc bucket: a
    * doc is a duplicate if its content digest first occurred at an
    * earlier doc_id. The operational twin of q110's vocabulary curve —
    * a RISING dup_frac slope tells the builder which ingest decade
    * started re-crawling old content. Same no-buffer trick: a digest is
    * new at exactly its min doc_id, so the curve is one digest-keyed
    * window + a distributed two-level prefix sum
    * ([[graft.ops.Prefix.cumSums]]) over the bucket table — |docs|/50
    * rows grows with the corpus, so the running total must not be a
    * single-task unpartitioned window. */
  def dedupCurve(s: SparkSession, dir: String, bucket: Long = 50L): DataFrame = {
    val wD = Window.partitionBy("digest")
    val perDoc = t(s, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("digest"))
      .withColumn("first_id", min(col("doc_id")).over(wD))
      .withColumn("is_dup", col("doc_id") =!= col("first_id"))
    val perBucket = perDoc
      .withColumn("bucket", floor(col("doc_id") / bucket))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("dups"))
    graft.ops.Prefix.cumSums(perBucket, "bucket", Seq("n", "dups"))
      .select(col("bucket"),
        col("n_cum").as("n_docs_cum"),
        col("dups_cum").as("n_dups_cum"))
      .withColumn("dup_frac",
        col("n_dups_cum").cast("double") / col("n_docs_cum"))
      .orderBy("bucket")
  }

  /** MERGE/upsert of an incoming snapshot into the standing corpus —
    * the warehouse MERGE INTO semantics (new version wins, unmatched
    * old rows carry forward, unmatched new rows insert) over the q88
    * snapshot fixtures, with the per-row action classification a merge
    * audit logs. Digests are computed AT THE SCAN on each side, so the
    * full-outer join shuffles (doc_id, 32-byte digest) — never text;
    * at 100 TB with both snapshots bucketed by doc_id the join is a
    * co-located zip (the S7 layout). */
  def upsertMerge(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val old = docs.filter(col("doc_id") % 5 =!= 4)
      .select(col("doc_id"), md5(substring(col("text"), 1, 120)).as("old_digest"))
    val nw = docs.filter(col("doc_id") % 7 =!= 3)
      .select(col("doc_id"), md5(col("text")).as("new_digest"))
    old.join(nw, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_digest").isNull, "insert")
          .when(col("new_digest").isNull, "carry")
          .when(col("old_digest") =!= col("new_digest"), "update")
          .otherwise("noop").as("action"),
        coalesce(col("new_digest"), col("old_digest")).as("digest"))
      .orderBy("doc_id")
  }

  /** SCD type-2 history build — the versioned-dimension shape every
    * warehouse keeps for slowly-changing rows: one row per (doc,
    * version span) with valid_from/valid_to version stamps and a
    * current flag, from the q88 snapshot pair (version 1 = legacy crawl,
    * version 2 = current). A doc whose content survived both versions
    * gets ONE spanning row; a changed doc closes its v1 row and opens a
    * current v2 row. Built as three narrow branches over the digest
    * diff frame (computed once) — the join shuffles ids and digests
    * only. */
  def scd2History(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val old = docs.filter(col("doc_id") % 5 =!= 4)
      .select(col("doc_id"), md5(substring(col("text"), 1, 120)).as("old_digest"))
    val nw = docs.filter(col("doc_id") % 7 =!= 3)
      .select(col("doc_id"), md5(col("text")).as("new_digest"))
    val diff = graft.Materialize.stable(
      old.join(nw, Seq("doc_id"), "full_outer"))
    val spanning = diff.filter(col("old_digest") === col("new_digest"))
      .select(col("doc_id"), col("old_digest").as("digest"),
        lit(1L).as("valid_from"), lit(2L).as("valid_to"), lit(true).as("is_current"))
    val closedV1 = diff
      .filter(col("old_digest").isNotNull &&
        (col("new_digest").isNull || col("old_digest") =!= col("new_digest")))
      .select(col("doc_id"), col("old_digest").as("digest"),
        lit(1L).as("valid_from"), lit(1L).as("valid_to"), lit(false).as("is_current"))
    val openedV2 = diff
      .filter(col("new_digest").isNotNull &&
        (col("old_digest").isNull || col("old_digest") =!= col("new_digest")))
      .select(col("doc_id"), col("new_digest").as("digest"),
        lit(2L).as("valid_from"), lit(2L).as("valid_to"), lit(true).as("is_current"))
    spanning.unionByName(closedV1).unionByName(openedV2)
      .orderBy("doc_id", "valid_from", "valid_to")
  }

  /** q139 — pairwise vocabulary overlap between sources: the Jaccard
    * similarity of the distinct-term sets of every source pair. The
    * "are these two crawls the same corpus wearing different names"
    * report — a high vocabulary Jaccard between sources flags
    * provenance mislabeling and guides mixture-weight consolidation
    * (two near-identical sources should not get two independent
    * weights in q82's mixture).
    *
    * Plan: ONE corpus-sized tokenize→distinct produces the
    * (source, term) vocabulary table; the pair intersection is a
    * self-equi-join on term — per-term fan-out is bounded by
    * |sources|² (a constant ≤ dozens), NOT by term frequency, because
    * the vocabulary table holds each (source, term) once. Pair counts
    * and the union come from inclusion–exclusion on the per-source
    * sizes, so no second corpus pass. */
  def sourceVocabOverlap(s: SparkSession, dir: String): DataFrame = {
    val st = graft.Tables.tSpread(s, dir, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .distinct()
    val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("v"))
    val inter = st.as("a").join(st.as("b"),
        col("a.term") === col("b.term") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select(col("source").as("src_a"), col("v").as("v_a"))), Seq("src_a"))
      .join(broadcast(sizes.select(col("source").as("src_b"), col("v").as("v_b"))), Seq("src_b"))
      .withColumn("jaccard", round(col("n_common").cast("double")
        / (col("v_a") + col("v_b") - col("n_common")), 6))
      .select(col("src_a"), col("src_b"), col("n_common"),
        col("v_a"), col("v_b"), col("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** q191 — source-pair shingle overlap by MERGEABLE MinHash sketch,
    * exact Jaccard alongside as calibration (the q149/q160 pattern:
    * estimator and ground truth in one row, so the oracle pins both and
    * the report self-documents sketch quality). Broder '97 bottom-k=1
    * per hash function, K=16 functions: per source the sketch is 16
    * column-wise MINs of md5("i:" || shingle) — duplicate-insensitive,
    * so at production scale it aggregates the RAW shingle stream in one
    * map-side-combined pass (NO distinct shuffle, unlike exact Jaccard
    * which must set-ify (source, shingle) — that asymmetry is the whole
    * point of shipping the sketch at 100 TB), and sketches are
    * mergeable across shards/corpus versions by taking mins of mins.
    * The estimate sum(m_i^A = m_i^B)/16 is deterministic given the
    * (public, engine-reproducible) md5 hash family, so unlike q43's
    * candidate-generation MinHash this ESTIMATE itself hash-matches the
    * oracle. Shares q71's 3-gram shingle recipe verbatim.
    *
    * Plan: one corpus-sized shingle explosion pinned once (three
    * consumers: sketch agg, sizes, intersection pair-expansion); the
    * |sources|×16 sketch and |sources| sizes broadcast back onto the
    * pair frame. Pairs with zero shared shingles are absent BY
    * construction (they derive from shingle co-occurrence) in both
    * engines.
    *
    * Exact-column plan (VERDICT r14 item 3, closing ADVICE r13): the
    * calibration intersection is NO self-join — the distinct
    * (source, shingle) frame groups BY shingle and each shingle's
    * sorted source set expands to its C(k, 2) ordered pairs in one
    * generate pass. Per-shingle work is provably bounded by the
    * CATALOG constant |sources| (k ≤ |sources|), never by a
    * boilerplate shingle's corpus frequency, and the shuffle carries
    * each (source, shingle) exactly once instead of a join's k-fold
    * probe-side duplication. The remaining corpus-scale cost is the
    * one distinct pass exact Jaccard inherently needs — which is why
    * the form you ship at 100 TB is still the sketch alone: q192
    * ([[sourceOverlapSketchStaged]]), no exact column, no distinct
    * pass, staged corpus side. */
  /** The sketch family's K (hash-function count). Shared by the inline
    * q191, the staged [[OverlapSketchIndex]], the staged q192, and the
    * streaming sketch maintainer — one constant, so the four forms can
    * never drift to incomparable sketches. */
  private[graft] val SketchK = 16

  /** Per-source bottom-1 MinHash sketch over the RAW 3-gram shingle
    * stream of a (source, text) frame: K column-wise MINs of
    * md5("i:" || shingle). min() is duplicate-insensitive, so unlike
    * q191's exact column this needs NO distinct shuffle — one
    * map-side-combined aggregation into |sources| rows — and sketches
    * from ANY row partition of the corpus merge exactly
    * ([[mergeSketches]]): min of mins. That pair of properties is the
    * whole staged/streamed story (q192, the ninth maintainer). */
  private[graft] def sourceSketch(docs: DataFrame): DataFrame = {
    import graft.functions.HashKernels.shingle_array
    docs
      .filter(size(tokens(col("text"))) >= 3)
      .select(col("source"), explode(shingle_array(col("text"), 3)).as("shingle"))
      .groupBy("source").agg(
        min(md5(concat_ws(":", lit("0"), col("shingle")))).as("m0"),
        (1 until SketchK).map(i =>
          min(md5(concat_ws(":", lit(i.toString), col("shingle")))).as(s"m$i")): _*)
  }

  /** min-of-mins merge of sketch rows from any number of shards /
    * corpus versions / stream segments — the mergeability that makes
    * the sketch the cheapest maintained state in the matrix
    * (|sources| × K cells). Idempotent under duplicated rows, so
    * re-delivered stream segments are harmless by algebra (the
    * paragraph family's presence property, here as MIN). */
  private[graft] def mergeSketches(sketches: DataFrame): DataFrame =
    sketches.groupBy("source").agg(
      min(col("m0")).as("m0"),
      (1 until SketchK).map(i => min(col(s"m$i")).as(s"m$i")): _*)

  /** All source pairs (a < b) with the sketch-estimated Jaccard
    * sum(m_i^A = m_i^B)/K — deterministic given the md5 family, so the
    * ESTIMATE itself hash-matches a DuckDB twin. The pair frame is
    * |sources|², a constant; the broadcast nested-loop join never sees
    * corpus-sized data. */
  private[graft] def sketchPairsEst(sketchRaw: DataFrame): DataFrame = {
    // both join sides derive from the sketch frame — unpinned, each
    // side would re-run the upstream shingle aggregation (two corpus/
    // batch passes for a |sources|-row frame)
    val sketch = graft.Materialize.stable(sketchRaw)
    val a = sketch.select(col("source").as("source_a") +:
      (0 until SketchK).map(i => col(s"m$i").as(s"a$i")): _*)
    val b = sketch.select(col("source").as("source_b") +:
      (0 until SketchK).map(i => col(s"m$i").as(s"b$i")): _*)
    val est = (0 until SketchK)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    broadcast(a).join(b, col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        est.as("n_match"),
        (est.cast("double") / SketchK).as("jaccard_est"))
      .orderBy("source_a", "source_b")
  }

  /** q192 — staged/add-batch corpus-overlap sketch: the corpus side's
    * shingling is paid ONCE per corpus version ([[OverlapSketchIndex]],
    * the q84/q132/q171/q186/q190 pattern applied to the sketch family);
    * per query only the BATCH (the mod-10 ingest side) is shingled, and
    * the two sketches min-merge into EXACTLY the whole-corpus sketch —
    * min-of-mins is lossless, not approximate-on-approximate. Output is
    * the all-pairs estimate frame; the oracle computes the same
    * estimate from scratch over the whole corpus, so a min lost or
    * invented anywhere in the stage/merge round-trip is a hash
    * mismatch (the staged ≡ inline BY DESIGN contract). Unlike q191
    * there is no exact-Jaccard calibration column here — this is the
    * form you ship at 100 TB, where the exact column's distinct + self-
    * join is precisely what the sketch exists to avoid. */
  def sourceOverlapSketchStaged(s: SparkSession, dir: String): DataFrame = {
    val base = OverlapSketchIndex.sketch(s, dir)
    val batch = sourceSketch(t(s, dir, "documents")
      .filter(NearDupOps.isNewDoc(col("doc_id"))))
    sketchPairsEst(mergeSketches(base.unionByName(batch)))
  }

  def sourceOverlapSketch(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashKernels.shingle_array
    val K = SketchK
    val st = graft.Materialize.stable(
      graft.Tables.tSpread(s, dir, "documents")
        .filter(size(tokens(col("text"))) >= 3)
        .select(col("source"), explode(shingle_array(col("text"), 3)).as("shingle"))
        .distinct())
    val mins = st.groupBy("source").agg(
      min(md5(concat_ws(":", lit("0"), col("shingle")))).as("m0"),
      (1 until K).map(i =>
        min(md5(concat_ws(":", lit(i.toString), col("shingle")))).as(s"m$i")): _*)
    val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    // shingle-grouped pair expansion: sorted source set -> C(k, 2)
    // ordered pairs, k bounded by the catalog's source count — no
    // self-join, no probe-side row duplication (VERDICT r14 item 3)
    val srcs = sort_array(collect_set(col("source")))
    val inter = st.groupBy(col("shingle"))
      .agg(srcs.as("srcs"))
      .filter(size(col("srcs")) >= 2)
      .select(explode(flatten(transform(col("srcs"), (x, i) =>
        transform(slice(col("srcs"), i + 2, size(col("srcs"))),
          y => struct(x.as("source_a"), y.as("source_b")))))).as("p"))
      .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("n_inter"))
    val est = (0 until K).map(i =>
      when(col(s"a$i") === col(s"b$i"), 1).otherwise(0)).reduce(_ + _)
    inter
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("n_sh").as("n_a"))), Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("n_sh").as("n_b"))), Seq("source_b"))
      .join(broadcast(mins.select(col("source").as("source_a") +:
        (0 until K).map(i => col(s"m$i").as(s"a$i")): _*)), Seq("source_a"))
      .join(broadcast(mins.select(col("source").as("source_b") +:
        (0 until K).map(i => col(s"m$i").as(s"b$i")): _*)), Seq("source_b"))
      .select(col("source_a"), col("source_b"),
        col("n_a"), col("n_b"), col("n_inter"),
        (col("n_inter").cast("double")
          / (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard_exact"),
        (est.cast("double") / K).as("jaccard_est"))
      .orderBy("source_a", "source_b")
  }

  /** q142 — language purity of near-dup clusters: for every q62 cluster,
    * its size, distinct-language count, majority language (count-desc,
    * lang-asc tie-break) and majority share. Mixed-language clusters are
    * the cross-lingual contamination signal — boilerplate or machine
    * translation binding "different-language" docs into one dup cluster
    * — and the screen a per-language mixture (q82/q143) needs before
    * trusting its strata.
    *
    * Plan: rides the staged q62 label frame (cluster ids are already
    * materialized through the BandIndex path); the purity report itself
    * is one (cluster, lang) aggregate plus a rank window over a frame
    * bounded by cluster count, never corpus size. */
  def clusterLangPurity(s: SparkSession, dir: String): DataFrame = {
    val labels = NearDupOps.dupClusters(s, dir)
      .select(col("doc_id"), col("cluster_id"))
    val byLang = labels
      .join(t(s, dir, "documents").select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("cluster_id"), col("lang"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("cluster_id").orderBy(col("n").desc, col("lang"))
    val sizes = byLang.groupBy("cluster_id")
      .agg(sum(col("n")).as("n_docs"), count(lit(1)).as("n_langs"))
    byLang.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("cluster_id"), col("lang").as("top_lang"), col("n").as("top_n"))
      .join(sizes, Seq("cluster_id"))
      .select(col("cluster_id"), col("n_docs"), col("n_langs"), col("top_lang"),
        round(col("top_n").cast("double") / col("n_docs"), 6).as("top_share"),
        (col("n_langs") > 1).as("mixed"))
      .orderBy("cluster_id")
  }

  /** q147 — effective token count after near-dup collapse: per source,
    * the raw token supply vs the supply counted ONCE per q62 cluster
    * (cluster canonical = the min-id member; docs outside any cluster
    * are their own canonical), and the dedup discount 1 − eff/raw. THE
    * budget-planning number: q143 allocates against raw supply, this
    * reports how much of that supply is unique content — a source with
    * a 40% discount delivers 40% fewer unique tokens than its size
    * claims, and its mixture weight is overstated by the same factor.
    *
    * Plan: rides the staged q62 label frame (cluster count ≪ corpus);
    * one left join of the per-doc token counts (narrow: id, source,
    * count — text never leaves the scan) against the labels, one
    * |sources|-row aggregate. */
  def effectiveTokens(s: SparkSession, dir: String): DataFrame = {
    val labels = NearDupOps.dupClusters(s, dir)
      .select(col("doc_id"), col("cluster_id"))
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("toks"))
      .join(labels, Seq("doc_id"), "left_outer")
      .withColumn("canonical",
        col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("raw_tokens"),
        sum(when(col("canonical"), col("toks")).otherwise(lit(0L)))
          .as("effective_tokens"))
      .withColumn("discount", round(lit(1.0)
        - col("effective_tokens").cast("double") / col("raw_tokens"), 6))
      .orderBy("source")
  }


  /** q164 — datasheet drift between snapshots: the q163 per-source card
    * computed for the legacy snapshot (doc_id % 5 ≠ 4, the q120
    * convention) and the current one (doc_id % 7 ≠ 3), full-outer
    * joined with deltas. The "what changed in my corpus this crawl"
    * monitor — a source whose dup rate jumps or whose token supply
    * halves gets caught HERE, before the mixture re-weights on bad
    * numbers. A source absent from one side reports its row with a
    * −1 sentinel on the missing side's counts (keeps dtypes integral).
    *
    * Plan: one scan feeds both snapshot aggregates (the filter is a
    * per-row predicate, not a second read); the join and deltas run on
    * |sources| rows. */
  def datasheetDrift(s: SparkSession, dir: String): DataFrame = {
    def card(pred: org.apache.spark.sql.Column): DataFrame =
      t(s, dir, "documents").filter(pred)
        .select(col("doc_id"), col("source"),
          size(tokens(col("text"))).cast("long").as("toks"),
          md5(lower(trim(col("text")))).as("digest"))
        .withColumn("rep",
          min(col("doc_id")).over(Window.partitionBy("digest")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") =!= col("rep"), 1L).otherwise(0L)).as("n_dups"),
          sum(col("toks")).as("tokens"))
    val legacy = card(col("doc_id") % 5 =!= 4)
      .select(col("source"), col("n_docs").as("n_docs_old"),
        col("n_dups").as("n_dups_old"), col("tokens").as("tokens_old"))
    val current = card(col("doc_id") % 7 =!= 3)
      .select(col("source"), col("n_docs").as("n_docs_new"),
        col("n_dups").as("n_dups_new"), col("tokens").as("tokens_new"))
    legacy.join(current, Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("n_docs_old"), lit(-1L)).as("n_docs_old"),
        coalesce(col("n_docs_new"), lit(-1L)).as("n_docs_new"),
        (coalesce(col("n_docs_new"), lit(0L))
          - coalesce(col("n_docs_old"), lit(0L))).as("d_docs"),
        coalesce(col("tokens_old"), lit(-1L)).as("tokens_old"),
        coalesce(col("tokens_new"), lit(-1L)).as("tokens_new"),
        (coalesce(col("tokens_new"), lit(0L))
          - coalesce(col("tokens_old"), lit(0L))).as("d_tokens"),
        coalesce(col("n_dups_old"), lit(-1L)).as("n_dups_old"),
        coalesce(col("n_dups_new"), lit(-1L)).as("n_dups_new"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q142_cluster_lang_purity" -> clusterLangPurity,
    "q164_datasheet_drift" -> datasheetDrift,
    "q147_effective_tokens" -> effectiveTokens,
    "q120_upsert_merge" -> upsertMerge,
    "q121_scd2_history" -> scd2History,
    "q111_pmi_collocations" -> ((s, dir) => pmiCollocations(s, dir)),
    "q113_source_term_affinity" -> ((s, dir) => sourceTermAffinity(s, dir)),
    "q114_schema_union" -> schemaUnion,
    "q115_dedup_curve" -> ((s, dir) => dedupCurve(s, dir)),
    "q139_source_vocab_overlap" -> sourceVocabOverlap,
    "q191_source_overlap_sketch" -> sourceOverlapSketch,
    "q192_overlap_sketch_staged" -> sourceOverlapSketchStaged)

  /** q191's oracle: the same md5 hash family is engine-reproducible, so
    * the sketch ESTIMATE (not just the exact column) hash-matches. */
  private val q191OracleSql: String = {
    val minCols = (0 until SketchK)
      .map(i => s"    min(md5('$i:' || shingle)) AS m$i").mkString(",\n")
    val estSum = (0 until SketchK)
      .map(i => s"(CASE WHEN ma.m$i = mb.m$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH sh AS (
       |  SELECT DISTINCT source, shingle FROM (
       |    SELECT source, unnest(CASE WHEN len(tk) < 3 THEN []
       |      ELSE list_transform(generate_series(1, len(tk) - 2),
       |           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END) AS shingle
       |    FROM (SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS tk
       |          FROM documents))),
       |mins AS (
       |  SELECT source,
       |$minCols
       |  FROM sh GROUP BY source),
       |sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY source),
       |inter AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    CAST(COUNT(*) AS BIGINT) AS n_inter
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT i.source_a, i.source_b, za.n_sh AS n_a, zb.n_sh AS n_b, i.n_inter,
       |  CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter) AS jaccard_exact,
       |  CAST($estSum AS DOUBLE) / $SketchK.0 AS jaccard_est
       |FROM inter i
       |JOIN sizes za ON za.source = i.source_a
       |JOIN sizes zb ON zb.source = i.source_b
       |JOIN mins ma ON ma.source = i.source_a
       |JOIN mins mb ON mb.source = i.source_b
       |ORDER BY i.source_a, i.source_b""".stripMargin
  }

  /** q192's oracle: the whole-corpus sketch estimate from scratch — no
    * DISTINCT (min is duplicate-insensitive, the property under test)
    * and ALL source pairs, not just intersecting ones (the pair frame
    * derives from the sketch table, which has no notion of "shared
    * shingle"). The staged plan must min-merge to exactly this. */
  private val q192OracleSql: String = {
    val minCols = (0 until SketchK)
      .map(i => s"    min(md5('$i:' || shingle)) AS m$i").mkString(",\n")
    val estSum = (0 until SketchK)
      .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH sh AS (
       |  SELECT source, unnest(CASE WHEN len(tk) < 3 THEN []
       |    ELSE list_transform(generate_series(1, len(tk) - 2),
       |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END) AS shingle
       |  FROM (SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS tk
       |        FROM documents)),
       |mins AS (
       |  SELECT source,
       |$minCols
       |  FROM sh GROUP BY source)
       |SELECT a.source AS source_a, b.source AS source_b,
       |  CAST($estSum AS BIGINT) AS n_match,
       |  CAST($estSum AS DOUBLE) / $SketchK.0 AS jaccard_est
       |FROM mins a JOIN mins b ON a.source < b.source
       |ORDER BY source_a, source_b""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q191_source_overlap_sketch" -> q191OracleSql,
    "q192_overlap_sketch_staged" -> q192OracleSql,
    "q164_datasheet_drift" ->
      """WITH base AS (SELECT doc_id, source,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS BIGINT) AS toks,
        |    md5(lower(trim(text))) AS digest
        |  FROM documents),
        |old1 AS (SELECT *, MIN(doc_id) OVER (PARTITION BY digest) AS rep
        |  FROM base WHERE doc_id % 5 <> 4),
        |oldc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_old,
        |    CAST(SUM(CASE WHEN doc_id <> rep THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_dups_old,
        |    CAST(SUM(toks) AS BIGINT) AS tokens_old
        |  FROM old1 GROUP BY 1),
        |new1 AS (SELECT *, MIN(doc_id) OVER (PARTITION BY digest) AS rep
        |  FROM base WHERE doc_id % 7 <> 3),
        |newc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_new,
        |    CAST(SUM(CASE WHEN doc_id <> rep THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_dups_new,
        |    CAST(SUM(toks) AS BIGINT) AS tokens_new
        |  FROM new1 GROUP BY 1)
        |SELECT source,
        |  COALESCE(n_docs_old, CAST(-1 AS BIGINT)) AS n_docs_old,
        |  COALESCE(n_docs_new, CAST(-1 AS BIGINT)) AS n_docs_new,
        |  COALESCE(n_docs_new, CAST(0 AS BIGINT))
        |    - COALESCE(n_docs_old, CAST(0 AS BIGINT)) AS d_docs,
        |  COALESCE(tokens_old, CAST(-1 AS BIGINT)) AS tokens_old,
        |  COALESCE(tokens_new, CAST(-1 AS BIGINT)) AS tokens_new,
        |  COALESCE(tokens_new, CAST(0 AS BIGINT))
        |    - COALESCE(tokens_old, CAST(0 AS BIGINT)) AS d_tokens,
        |  COALESCE(n_dups_old, CAST(-1 AS BIGINT)) AS n_dups_old,
        |  COALESCE(n_dups_new, CAST(-1 AS BIGINT)) AS n_dups_new
        |FROM oldc FULL OUTER JOIN newc USING (source)
        |ORDER BY source""".stripMargin,
    "q147_effective_tokens" ->
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
        |tk AS (SELECT doc_id, source,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS toks
        |  FROM documents)
        |SELECT tk.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(toks) AS BIGINT) AS raw_tokens,
        |  CAST(SUM(CASE WHEN l.cluster_id IS NULL OR l.cluster_id = tk.doc_id
        |    THEN toks ELSE 0 END) AS BIGINT) AS effective_tokens,
        |  round(CAST(1 AS DOUBLE)
        |    - CAST(SUM(CASE WHEN l.cluster_id IS NULL OR l.cluster_id = tk.doc_id
        |        THEN toks ELSE 0 END) AS DOUBLE) / CAST(SUM(toks) AS DOUBLE), 6)
        |    AS discount
        |FROM tk LEFT JOIN labels l ON l.doc_id = tk.doc_id
        |GROUP BY tk.source ORDER BY tk.source""".stripMargin,
    "q142_cluster_lang_purity" ->
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
        |bylang AS (
        |  SELECT l.cluster_id, d.lang, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM labels l JOIN documents d USING (doc_id)
        |  GROUP BY 1, 2),
        |csz AS (SELECT cluster_id, CAST(SUM(n) AS BIGINT) AS n_docs,
        |    CAST(COUNT(*) AS BIGINT) AS n_langs FROM bylang GROUP BY 1),
        |top AS (
        |  SELECT cluster_id, lang AS top_lang, n AS top_n,
        |    row_number() OVER (PARTITION BY cluster_id ORDER BY n DESC, lang) AS rk
        |  FROM bylang QUALIFY rk = 1)
        |SELECT t.cluster_id, c.n_docs, c.n_langs, t.top_lang,
        |  round(CAST(t.top_n AS DOUBLE) / c.n_docs, 6) AS top_share,
        |  c.n_langs > 1 AS mixed
        |FROM top t JOIN csz c USING (cluster_id)
        |ORDER BY cluster_id""".stripMargin,
    "q139_source_vocab_overlap" ->
      """WITH st AS (SELECT DISTINCT source, term FROM (
        |    SELECT source,
        |      unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        |    FROM documents)),
        |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS v FROM st GROUP BY 1),
        |i AS (SELECT a.source AS src_a, b.source AS src_b,
        |        CAST(COUNT(*) AS BIGINT) AS n_common
        |      FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT src_a, src_b, n_common, va.v AS v_a, vb.v AS v_b,
        |  round(CAST(n_common AS DOUBLE) / (va.v + vb.v - n_common), 6) AS jaccard
        |FROM i JOIN sz va ON i.src_a = va.source
        |       JOIN sz vb ON i.src_b = vb.source
        |ORDER BY src_a, src_b""".stripMargin,
    "q120_upsert_merge" ->
      """WITH old AS (SELECT doc_id, md5(substr(text, 1, 120)) AS old_digest
        |             FROM documents WHERE doc_id % 5 <> 4),
        |new AS (SELECT doc_id, md5(text) AS new_digest
        |        FROM documents WHERE doc_id % 7 <> 3)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'insert'
        |       WHEN n.doc_id IS NULL THEN 'carry'
        |       WHEN old_digest <> new_digest THEN 'update'
        |       ELSE 'noop' END AS action,
        |  COALESCE(new_digest, old_digest) AS digest
        |FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,
    "q121_scd2_history" ->
      """WITH old AS (SELECT doc_id, md5(substr(text, 1, 120)) AS old_digest
        |             FROM documents WHERE doc_id % 5 <> 4),
        |new AS (SELECT doc_id, md5(text) AS new_digest
        |        FROM documents WHERE doc_id % 7 <> 3),
        |d AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, old_digest, new_digest
        |      FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id)
        |SELECT doc_id, old_digest AS digest,
        |  CAST(1 AS BIGINT) AS valid_from, CAST(2 AS BIGINT) AS valid_to,
        |  true AS is_current
        |FROM d WHERE old_digest = new_digest
        |UNION ALL
        |SELECT doc_id, old_digest, CAST(1 AS BIGINT), CAST(1 AS BIGINT), false
        |FROM d WHERE old_digest IS NOT NULL
        |  AND (new_digest IS NULL OR old_digest <> new_digest)
        |UNION ALL
        |SELECT doc_id, new_digest, CAST(2 AS BIGINT), CAST(2 AS BIGINT), true
        |FROM d WHERE new_digest IS NOT NULL
        |  AND (old_digest IS NULL OR old_digest <> new_digest)
        |ORDER BY doc_id, valid_from, valid_to""".stripMargin,
    "q111_pmi_collocations" ->
      """WITH tk AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |            FROM documents),
        |uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
        |        FROM (SELECT unnest(tk) AS w FROM tk) GROUP BY 1),
        |n1 AS (SELECT CAST(SUM(c) AS BIGINT) AS n1 FROM uni),
        |p AS (SELECT doc_id,
        |    unnest(CASE WHEN len(tk) < 2 THEN []
        |      ELSE list_transform(generate_series(1, len(tk) - 1),
        |           i -> struct_pack(w1 := tk[i], w2 := tk[i+1])) END) AS pr
        |  FROM tk),
        |pairs AS (SELECT pr.w1 AS w1, pr.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c12
        |          FROM p GROUP BY 1, 2),
        |n2 AS (SELECT CAST(SUM(c12) AS BIGINT) AS n2 FROM pairs)
        |SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2,
        |  round(ln((CAST(c12 AS DOUBLE) / n2)
        |    / ((CAST(u1.c AS DOUBLE) / n1) * (CAST(u2.c AS DOUBLE) / n1))), 4)
        |    AS pmi
        |FROM pairs
        |JOIN uni u1 ON pairs.w1 = u1.w
        |JOIN uni u2 ON pairs.w2 = u2.w
        |CROSS JOIN n1 CROSS JOIN n2
        |WHERE c12 >= 25
        |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,
    "q113_source_term_affinity" ->
      """WITH st AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c_st
        |  FROM (SELECT source,
        |          unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        |        FROM documents)
        |  GROUP BY 1, 2),
        |tt AS (SELECT term, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
        |srct AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS c_s FROM st GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c_st) AS BIGINT) AS c_all FROM st),
        |sc AS (SELECT st.source, st.term, st.c_st, tt.c_t,
        |    round(ln((CAST(st.c_st AS DOUBLE) / srct.c_s)
        |      / (CAST(tt.c_t AS DOUBLE) / tot.c_all)), 4) AS score
        |  FROM st JOIN tt USING (term) JOIN srct USING (source) CROSS JOIN tot
        |  WHERE st.c_st >= 20),
        |r AS (SELECT *, row_number() OVER
        |    (PARTITION BY source ORDER BY score DESC, term) AS rank FROM sc)
        |SELECT source, CAST(rank AS BIGINT) AS rank, term, c_st, c_t, score
        |FROM r WHERE rank <= 3 ORDER BY source, rank""".stripMargin,
    "q114_schema_union" ->
      """WITH merged AS (
        |  SELECT doc_id, text, lang, source, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, substr(text, 1, 120), NULL, source, NULL
        |  FROM documents WHERE doc_id % 5 <> 4)
        |SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_legacy,
        |  CAST(SUM(COALESCE(n_chars, -1)) AS BIGINT) AS sum_chars_sentinel,
        |  CAST(COUNT(n_chars) AS BIGINT) AS n_with_chars
        |FROM merged GROUP BY source ORDER BY source""".stripMargin,
    "q115_dedup_curve" ->
      """WITH d AS (SELECT doc_id, md5(text) AS digest FROM documents),
        |f AS (SELECT doc_id,
        |    doc_id <> MIN(doc_id) OVER (PARTITION BY digest) AS is_dup
        |  FROM d),
        |pb AS (SELECT CAST(floor(doc_id / 50) AS BIGINT) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS dups
        |  FROM f GROUP BY 1)
        |SELECT bucket,
        |  CAST(SUM(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS n_docs_cum,
        |  CAST(SUM(dups) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS n_dups_cum,
        |  CAST(SUM(dups) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |    / CAST(SUM(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
        |        AS BIGINT) AS dup_frac
        |FROM pb ORDER BY bucket""".stripMargin)
}
