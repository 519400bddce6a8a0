package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling soak: replicate the sf0.1 documents/embeddings tables Nx with
  * perturbed ids and time the subquadratic near-dup pipelines at each
  * scale, to observe how the LSH paths grow. Usage:
  *   runMain graft.tools.ScaleSoak [replication]
  */
object ScaleSoak {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(10)
    // Shuffle partitions must SCALE with the corpus (the sizing rule
    // this soak exists to validate): at reps=1000 the BM25 posting
    // aggregation is ~300M rows — 8 partitions put ~37M hash-agg groups
    // in one task and the 8g soak JVM dies with AGGREGATE_OUT_OF_MEMORY
    // (observed at the 5M-doc point). Round-9 re-measure: the reps/8
    // rule still under-partitioned the graph family at reps=100 (12
    // partitions × 5M lineitem rows/task → spill-dominated:
    // graph_index_build showed a 25×/decade slope that linear work
    // cannot produce); partitions now track reps directly, capped at
    // 256 for local[8] task-overhead sanity. On a real cluster this is
    // spark.sql.shuffle.partitions ∝ input bytes — the same knob.
    val shufflePartitions = math.max(8, math.min(256, reps))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // See Bench: keep ContextCleaner fed across the soak's job train.
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val dir = java.nio.file.Files.createTempDirectory("soak").toString

    // Three corpus modes:
    //  - replicate (args(1)="rep"): every replica is a near-dup of its
    //    base → dup-DENSE corpus, stresses candidate-pair volume
    //    (quadratic genuine output inside each replica cluster);
    //  - exact (args(1)="exact"): every replica is an EXACT copy →
    //    stresses the digest-collapse path (reps stay constant at the
    //    base corpus size, so banding cost must stay flat while the
    //    expanded pair output grows quadratically per group);
    //  - synthetic (default): hash-generated docs over a shared
    //    vocabulary → dup-SPARSE corpus, measures clean scaling;
    //  - skew (args(1)="skew"): synthetic text, but ONE source owns 80%
    //    of the corpus and ~10% of docs are exact copies drawn from a
    //    small seed pool → realistic web-crawl shape; exercises the
    //    q79/q83 digest exchanges and the q72 source rollup under
    //    provenance skew, and the collapse path under a real dup rate.
    val mode = args.lift(1).getOrElse("synthetic")
    // Optional third arg: comma-separated op names — time only those
    // (fresh-JVM single-op timings, for separating an op's own cost
    // from session state accumulated by the ops before it). Hoisted
    // above the fixture writes so a filtered run also SKIPS the table
    // replications nothing selected reads: the 20M-vector semdedup
    // decade (round-11) would otherwise pay a 6-billion-row lineitem
    // replication it never touches.
    val only: Option[Set[String]] = args.lift(2).map(_.split(',').toSet)
    val embStages = Set("semdedup_index_build", "semdedup_staged_probe",
      "fixed_batch_semdedup_probe", "embed_neardup_lsh")
    val liStages = Set("graph_index_build", "triangle_counts",
      "degree_add_batch")
    // The hot-fingerprint stages synthesize their own (doc_id, fp)
    // frame — a filtered run selecting only them must not replicate
    // any fixture table.
    val synthFpStages = Set("audio_hot_narrow", "audio_hot_wide")
    val needEmb = only.forall(_.exists(embStages.contains))
    val needLi = only.forall(_.exists(liStages.contains))
    val needDocs = only.forall(_.exists(n => !embStages.contains(n) &&
      !liStages.contains(n) && !synthFpStages.contains(n)))
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.count()
    if (!needDocs) ()
    else if (mode == "rep" || mode == "exact") {
      docs.crossJoin(spark.range(reps.toLong).select(col("id").as("rep")))
        .select(
          (col("doc_id") + col("rep") * nDocs).as("doc_id"),
          when(col("rep") === 0 || lit(mode == "exact"), col("text"))
            .otherwise(concat_ws(" ", col("text"), concat(lit("rep"), col("rep"))))
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
        .repartition(8)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    } else {
      val n = nDocs * reps
      val vocabArr = array((0 until 1000).map(i => lit(s"w$i")): _*)
      // In skew mode, 1 in 10 docs re-draws its text from a pool of
      // n/20 seeds (exact-dup groups, ~5k-member mega-groups at the 5M
      // point); otherwise the text seed is the doc id (dup-sparse).
      val seed =
        if (mode == "skew")
          when(pmod(xxhash64(col("doc_id"), lit(7)), lit(10)) === 0,
            pmod(col("doc_id"), lit(math.max(n / 20, 1L))))
            .otherwise(col("doc_id"))
        else col("doc_id")
      val source =
        if (mode == "skew")
          when(pmod(xxhash64(col("doc_id"), lit(11)), lit(10)) < 8, lit("web"))
            .otherwise(concat(lit("src_"),
              pmod(xxhash64(col("doc_id"), lit(13)), lit(5)).cast("string")))
        else lit("synth")
      spark.range(n).select(col("id").as("doc_id"))
        .withColumn("s", seed)
        .select(col("doc_id"), col("s"),
          concat_ws(" ", transform(
            sequence(lit(1), lit(40) + pmod(xxhash64(col("s")), lit(40)).cast("int")),
            i => element_at(vocabArr,
              (pmod(xxhash64(col("s"), i), lit(1000)) + 1).cast("int"))))
            .as("text"))
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          source.as("source"), length(col("text")).cast("long").as("n_chars"))
        .repartition(8)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val nEmb = emb.count()
    // Cluster-key cardinality rule shared by the replication and the
    // fixed-batch probe below (k ≈ n/1000 — see the else-branch note).
    val labelMod = math.max(10L, nEmb * reps / 1000L)
    if (!needEmb) ()
    else if (mode == "rep") {
      emb.crossJoin(spark.range(reps.toLong).select(col("id").as("rep")))
        .select(
          (col("vec_id") + col("rep") * nEmb).as("vec_id"),
          col("embedding"), col("label"))
        .repartition(8)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    } else {
      // hash-derived pseudo-gaussian-ish vectors: dup-sparse. The
      // cluster key cardinality GROWS with the corpus (k ≈ n/1000 —
      // the SemDeDup contract, and the q90 docstring's note): semantic
      // dedup's within-cluster pairwise pass is O(n·width), so a fixed
      // 10-label fixture shape at 1000× would be a ~10¹¹-pair
      // quadratic, which no deployment would run — k∝n is the
      // published recipe, not a soak convenience.
      spark.range(nEmb * reps).select(col("id").as("vec_id"))
        .select(col("vec_id"),
          transform(sequence(lit(0), lit(63)), i =>
            ((pmod(xxhash64(col("vec_id"), i), lit(2001)) - 1000) / 1000.0)
              .cast("float")).as("embedding"),
          pmod(col("vec_id"), lit(labelMod)).cast("int").as("label"))
        .repartition(8)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }

    // Co-purchase graph fixture (round-9 GraphIndex soak): replicate
    // lineitem with BOTH keys shifted per replica — reps disjoint
    // copies of the graph. Edges/triangles then grow linearly with the
    // corpus, so a super-linear graph_index_build or triangle slope is
    // a plan bug, not a data artifact. (A fixed part keyspace would
    // instead densify the graph quadratically — a different, valid
    // stress, but not a clean scaling readout.)
    if (needLi) {
      val li = spark.read.parquet(s"$src/lineitem.parquet")
      val (maxOrd, maxPart) = {
        val r = li.agg(max("l_orderkey"), max("l_partkey")).head()
        (r.getLong(0) + 1, r.getLong(1) + 1)
      }
      li.crossJoin(spark.range(reps.toLong).select(col("id").as("rep")))
        .withColumn("l_orderkey", col("l_orderkey") + col("rep") * maxOrd)
        .withColumn("l_partkey", col("l_partkey") + col("rep") * maxPart)
        .drop("rep")
        .repartition(8)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    }
    // This VM shows phantom load (loadavg 4-8 with zero local processes)
    // in bursts that slow whatever op they land on 3-7x — annotate every
    // timing with the loadavg so a slow line can be attributed to the
    // machine, not the plan (SURVEY §8.11/§8.12).
    def loadavg: String =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(" ").head
      catch { case _: Throwable => "?" }
    def time(name: String)(f: => Unit): Unit = if (only.forall(_.contains(name))) {
      val l0 = loadavg
      val t0 = System.nanoTime()
      f
      println(f"[soak] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.1fs" +
        s"  load=$l0->$loadavg")
    }
    println(s"[soak] corpus: ${nDocs * reps} docs, ${nEmb * reps} vectors")
    // The staged-corpus build is a real pipeline stage — time it
    // explicitly so probe timings below measure probes, not the build
    // the first staged query would otherwise absorb.
    time("band_index_build") {
      graft.llm.BandIndex.ensure(spark, dir, graft.llm.BandIndex.Boundary.all)
      ()
    }
    // Staged PROBE paths (round-4 item #6): the per-ingest cost that
    // must stay O(batch) while the indexes above grow with the corpus.
    // Builds are timed separately (band_index_ingest_build /
    // posting_index_build) so the probe lines measure probes.
    time("band_index_ingest_build") {
      graft.llm.BandIndex.ensure(spark, dir,
        graft.llm.BandIndex.Boundary.ingestMod10)
      ()
    }
    time("incremental_staged_probe") {
      graft.llm.NearDupOps.incrementalNearDupStaged(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // SemDedup staged split (q171): the offline cluster-restricted
    // pairwise pass vs the O(batch) probe that unions batch-touching
    // cosine edges with the staged component graph — the same
    // build/probe asymmetry the band and posting indexes show. Skipped
    // in rep mode, which replicates the 10-label fixture embeddings
    // verbatim: constant cluster count at growing n is the quadratic
    // shape the k∝n contract above exists to rule out.
    if (mode != "rep") {
      time("semdedup_index_build") {
        graft.llm.SemDedupIndex.ensure(spark, dir)
        ()
      }
      time("semdedup_staged_probe") {
        graft.llm.VectorOps.semanticDedupStaged(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // FIXED-batch probes (round-11): the staged-probe lines above grow
    // their batch WITH the corpus (the mod-10 split), so their decade
    // slope mixes batch growth into the reading. These two probe a
    // fixed 2000-row batch through the streaming maintainers against
    // the staged corpus state — the O(batch) claim in its pure form:
    // each line must stay ~FLAT as reps grows 10×. Batch ids sit far
    // above any replica id, so the batch is all-novel (the worst case
    // for the banding path: nothing exact-collapses away).
    val fixedIdBase = 4000000000000L
    time("fixed_batch_band_probe") {
      val root = java.nio.file.Files.createTempDirectory("fb-band").toString
      val idx = graft.llm.BandIndex.ensure(spark, dir,
        graft.llm.BandIndex.Boundary.all)
      val store = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
      val batch = spark.range(fixedIdBase, fixedIdBase + 2000L)
        .select(col("id").as("doc_id"),
          StreamSoak.synthText(col("id")).as("text"))
      graft.streaming.StreamingBandMaintenance.bandMaintain(
        idx, store, s"$root/delta", s"$root/out")(batch, 0L)
    }
    if (mode != "rep") time("fixed_batch_semdedup_probe") {
      val root = java.nio.file.Files.createTempDirectory("fb-sem").toString
      graft.llm.SemDedupIndex.ensure(spark, dir)
      val batch = spark.range(fixedIdBase, fixedIdBase + 2000L)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)), i =>
            ((pmod(xxhash64(col("vec_id"), i), lit(2001)) - 1000) / 1000.0)
              .cast("float")).as("embedding"),
          pmod(col("vec_id"), lit(labelMod)).cast("int").as("label"))
      graft.streaming.StreamingSemDedupMaintenance.semDedupMaintain(
        graft.llm.SemDedupIndex.corpus(spark, dir), s"$root/delta")(batch, 0L)
    }
    // Paragraph family (round 13): the corpus-wide CCNet dedup (q187
    // shape — one digest hash-agg + the join-back exchange that
    // reconstructs cleaned text), the staged digest-index build (one
    // 32-hex-char column), and the q190-shaped staged probe whose cost
    // must track the mod-10 batch, not the corpus. The fixed-batch
    // variant below is the O(batch) claim in its pure form.
    time("paragraph_dedup") {
      graft.llm.TextOps.paragraphDedup(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("paradg_index_build") {
      graft.llm.ParaDigestIndex.ensure(spark, dir)
      ()
    }
    time("paragraph_staged_probe") {
      graft.llm.TextOps.paragraphDedupStaged(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // setup OUTSIDE the timed block (ADVICE r13): dgs() lazily runs
    // the corpus-linear index build when paradg_index_build wasn't
    // selected in the same run, and the segment maintain is the
    // stream's write cost, not the probe's — timing either inside
    // would silently absorb O(corpus) into the "flat O(batch)" claim.
    // The whole block still honors the ops filter (a filtered run that
    // never replicated documents must not touch the docs fixture).
    if (only.forall(_.contains("fixed_batch_paragraph_probe"))) {
      val root = java.nio.file.Files.createTempDirectory("fb-para").toString
      val base = graft.llm.ParaDigestIndex.dgs(spark, dir)
      val seg = spark.range(fixedIdBase, fixedIdBase + 2000L)
        .select(col("id").as("doc_id"),
          StreamSoak.synthText(col("id")).as("text"))
      val probe = spark.range(fixedIdBase + 2000L, fixedIdBase + 4000L)
        .select(col("id").as("doc_id"),
          StreamSoak.synthText(col("id")).as("text"))
      graft.streaming.StreamingParagraphMaintenance.paragraphMaintain(
        s"$root/delta")(seg, 0L)
      time("fixed_batch_paragraph_probe") {
        graft.streaming.StreamingParagraphMaintenance.cleanedProbe(
          spark, probe, base, s"$root/delta")
          .write.format("noop").mode("overwrite").save()
      }
    }
    // Round-14 batch ops (r13 verdict item 5): both claim narrow
    // scan-reduction shapes — clusterDiff reduces every doc to
    // (id, 16-byte lead key, 2 booleans) in ONE conditional-agg pass;
    // the sketch half of q191/q192 is one map-side-combined min pass
    // into |sources|×16 cells (no distinct, no self-join — the exact
    // calibration column deliberately excluded). A linear decade slope
    // here is the corpus-linear evidence.
    time("cluster_diff") {
      graft.llm.CorpusOps.clusterDiff(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("overlap_sketch") {
      graft.llm.CorpusAudit.sketchPairsEst(
        graft.llm.CorpusAudit.mergeSketches(
          graft.llm.CorpusAudit.sourceSketch(
            spark.read.parquet(s"$dir/documents.parquet"))))
        .write.format("noop").mode("overwrite").save()
    }
    time("posting_index_build") {
      graft.llm.PostingIndex.ensure(spark, dir)
      ()
    }
    time("bm25_staged_probe") {
      graft.llm.RetrievalOps.bm25Staged(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("minhash_pairs") {
      graft.llm.NearDupOps.minhashPairs(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("minhash_neardup") {
      graft.llm.NearDupOps.minhashNearDup(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("doc_embed_neardup") {
      graft.llm.NearDupOps.docEmbedNearDup(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("embed_neardup_lsh") {
      graft.llm.VectorOps.embedNearDupLsh(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("simhash") {
      graft.llm.NearDupOps.simhash(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // Media perceptual near-dup (q182/q186) — the round-12
    // combinatorial-banding scale readout: 20 keys of 30 bits give
    // expected candidate pairs ~20·N²/2^30 over N distinct
    // fingerprints, so BOTH the wall time and the candidate-pair count
    // must grow ~linearly per decade below ~10^8 fingerprints (the
    // 4×15-bit banding this replaced saturates its 2^15 buckets around
    // 10^6 — its candidate count would grow ~100× per decade). The
    // count is printed explicitly so the slope is observed, not
    // inferred from time (which the O(bytes) hash pass dominates).
    if (only.forall(_.contains("media_neardup"))) {
      val mfps = graft.Materialize.stable(graft.llm.MultimodalOps.mediaFps(
        spark.read.parquet(s"$dir/documents.parquet")))
      time("media_neardup") {
        graft.llm.MultimodalOps.fpPairs(mfps)
          .write.format("noop").mode("overwrite").save()
      }
      val bkeys = graft.llm.MultimodalOps.hammingBandKeys(col("fp"))
      val bands = mfps.select("fp").distinct()
        .select(col("fp"), explode(bkeys).as("bk"))
      val nCand = bands.as("a").join(bands.as("b"),
        col("a.bk") === col("b.bk") && col("a.fp") < col("b.fp"))
        .select(col("a.fp"), col("b.fp")).distinct().count()
      val nFp = mfps.select("fp").distinct().count()
      println(s"[soak] media_candidates         n_fp=$nFp n_cand=$nCand" +
        s"  load=$loadavg")
      // The media twin of the saturated_bands line below: hot buckets
      // make the (exact, guard-free) bucket join quadratic — the count
      // must stay 0 until the decade where 20·N/2^30 keys per bucket
      // stops being sparse, and any non-zero here is the cue to widen
      // the band keys before that quadratic term lands.
      val nHot = graft.llm.MultimodalOps.saturatedMediaBuckets(mfps).count()
      println(s"[soak] media_saturated_buckets  n=$nHot  load=$loadavg")
    }
    // Audio energy-profile family (q196/q197, round 15): same 60-bit
    // banding math as media, different kernel — one O(bytes) PCM pass
    // per doc, then the shared pair tail. Wall time must stay ~linear
    // per decade; the saturated-bucket count is the same early-warning
    // dial.
    if (only.forall(_.contains("audio_neardup"))) {
      val afps = graft.Materialize.stable(graft.llm.MultimodalOps.audioFps(
        spark.read.parquet(s"$dir/documents.parquet")))
      time("audio_neardup") {
        graft.llm.MultimodalOps.fpNeighborReport(afps)
          .write.format("noop").mode("overwrite").save()
      }
      val nHot = graft.llm.MultimodalOps.saturatedMediaBuckets(afps).count()
      // the r16 plan-time decision's inputs + what it chooses (wide
      // arms at the measured break-even, r17 re-fit: cand > 4000 * n_fp);
      // per decade so the crossover stays observed as corpora grow
      val (cand, nFp) = graft.llm.MultimodalOps.narrowBandStats(afps)
      val arm = graft.llm.MultimodalOps.wideWorthIt(cand, nFp,
        graft.llm.MultimodalOps.bandBreakEven(spark))
      println(s"[soak] audio_fps                n_fp=$nFp " +
        s"saturated_buckets=$nHot narrow_cand=$cand " +
        s"auto_chooses=${if (arm) "wide" else "narrow"}  load=$loadavg")
    }
    // The widening dial under the SAME corpus: 7-of-10 banding must
    // flatten the decade where the narrow 3-of-6 buckets saturate
    // (identical output — banding is exact either way).
    if (only.forall(_.contains("audio_neardup_wide"))) {
      val afps = graft.Materialize.stable(graft.llm.MultimodalOps.audioFps(
        spark.read.parquet(s"$dir/documents.parquet")))
      time("audio_neardup_wide") {
        graft.llm.MultimodalOps.fpNeighborReport(afps, wide = true)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // The SATURATED-narrow regime (round 17): the synthetic audio
    // corpus above stays on the narrow side of the shipped break-even
    // all the way to 14M docs (measured C/D = 3695 at that decade,
    // `docs/soak_r17_scale2.log`), so no at-scale printout existed
    // where the engine chooses WIDE and wide measures faster — the
    // side of the dial the decision exists for. This fixture generates
    // that regime directly: D = 2000·reps distinct 60-bit fingerprints
    // whose narrow blocks 3–5 are CONSTANT (one saturated 30-bit
    // bucket — the correlated-clone corpus shape MultimodalSpec pins
    // in miniature) while the low 30 bits are hash-random, giving
    // narrow candidates ≈ D²/2, i.e. C/D ≈ D/2 — past the 4000
    // break-even from D ≈ 8000 up. Wide 6-bit blocks split the varying
    // 30 bits across five blocks, so wide buckets stay sparse
    // (expected wide candidates ≈ C(5,2)·D²/2^13). Both arms run on
    // the SAME pin; the printed decision must name the measured faster
    // arm. The fp frame is synthesized, not kernel-derived — the
    // decision and both pair tails operate purely on (doc_id, fp), so
    // the kernel is orthogonal to what this stage measures.
    if (only.forall(o => o.contains("audio_hot_narrow") ||
        o.contains("audio_hot_wide"))) {
      val d = 2000L * reps
      val hot = graft.Materialize.stable(
        spark.range(d).select(col("id").as("doc_id"),
          lit(0x0FFF7EA5L << 30).bitwiseOR(
            xxhash64(col("id"), lit(99)).bitwiseAND(lit(0x3FFFFFFFL)))
            .as("fp")))
      val (cand, nFp) = graft.llm.MultimodalOps.narrowBandStats(hot)
      val arm = graft.llm.MultimodalOps.wideWorthIt(cand, nFp,
        graft.llm.MultimodalOps.bandBreakEven(spark))
      println(s"[soak] audio_hot_fps            n_fp=$nFp narrow_cand=$cand " +
        s"auto_chooses=${if (arm) "wide" else "narrow"}  load=$loadavg")
      time("audio_hot_narrow") {
        graft.llm.MultimodalOps.fpNeighborReport(hot, wide = false)
          .write.format("noop").mode("overwrite").save()
      }
      time("audio_hot_wide") {
        graft.llm.MultimodalOps.fpNeighborReport(hot, wide = true)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // q195 (round 15): the full CCNet+fuzzy curation capstone — five
    // chained stages whose every shuffle carries ids/digests; the
    // decade slope must track the corpus (paragraph digesting + the
    // banding of exact-survivor cleaned texts dominate).
    time("full_curation") {
      graft.llm.SamplingOps.fullCuration(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // q198 (round 16): duplicated-span mining — one positional-gram
    // digest agg (O(corpus tokens) rows of 16-byte keys), a semi-join
    // back, per-doc run windows. The decade slope must track corpus
    // tokens; there is no quadratic term to watch, the readout is the
    // gram-shuffle constant.
    time("dup_spans") {
      graft.llm.TextOps.dupSpans(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // q199 (round 17): the removal twin — same gram-digest shuffle
    // shape as dup_spans plus the first-occurrence min agg and the
    // per-doc cut lambda; the decade slope must stay ~linear (the cut
    // adds no corpus-sized state, only per-doc runs arrays).
    time("dup_span_remove") {
      graft.llm.TextOps.dupSpanRemoveQuery(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // ExactSubstr (q85) — the steepest inherent curve in the catalog:
    // the sampled-gram digest shuffle is O(corpus bytes / 16) by
    // construction, so its soak slope must stay ~linear per decade and
    // the boilerplate cap (≤50 reps/gram) must keep the digest
    // self-join sparse EVEN on dup-dense corpora (run this in `rep` /
    // `skew` modes as well as synthetic — exact clones collapse before
    // gram sampling, so replica density must NOT appear in the slope).
    time("substring_overlap") {
      graft.llm.NearDupOps.substringOverlap(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("dup_clusters") {
      graft.llm.NearDupOps.dupClusters(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // Round-3 corpus ops with corpus-proportional shuffles: the gram-
    // digest window (q79), the tf build + broadcast scoring (q80), and
    // the digest-window dup report (q83) — all must scale ~linearly.
    time("common_gram_filter") {
      graft.llm.CorpusOps.commonGramFilter(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("tfidf_terms") {
      graft.llm.CorpusOps.tfidfTerms(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("dup_rate_by_source") {
      graft.llm.CorpusOps.dupRateBySource(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // Round-4 corpus ops with corpus-proportional shuffles: the exact
    // span dedup's digest window (q101) and the chunk-granular
    // MinHash+LSH cascade (q107 — the catalog's most expensive single
    // query; its soak slope is the evidence the banding stays
    // subquadratic as chunks multiply).
    time("window_dedup") {
      graft.llm.QualityOps.windowDedup(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("chunk_neardup") {
      graft.llm.NearDupOps.chunkNearDup(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // Round-4 retrieval ops: BM25's posting build is one corpus
    // tokenize+count shuffle (must scale linearly, like q80's tf), and
    // the split-leakage audit rides the q43 cascade plus a per-pair
    // md5 — its slope must track minhash_neardup's.
    // q139's vocabulary self-join: the (source, term) distinct table is
    // corpus-proportional, but per-term fan-out is bounded by |sources|²
    // — the soak slope must stay ~linear per decade like q80's tf build.
    time("source_vocab_overlap") {
      graft.llm.CorpusAudit.sourceVocabOverlap(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("bm25_search") {
      graft.llm.RetrievalOps.bm25Search(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("split_leakage") {
      graft.llm.RetrievalOps.splitLeakage(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // The saturation contract's soak assertion (ADVICE r2): pair-level
    // completeness inside a saturated band rests on the 8-hub star, so
    // report how many post-collapse distinct-text bands enter that
    // regime at this scale. Non-zero is not an error per se — it means
    // the pair LISTING is hub-limited there while cluster connectivity
    // still holds — but it must be a conscious, visible state.
    time("saturated_bands") {
      val n = graft.llm.NearDupOps.saturatedBands(spark, dir).count()
      println(s"[soak] saturated distinct-text bands: $n")
    }
    // q178 concat-and-chunk: the prefix scan must stay block-bounded
    // and the explode fan-out linear as the token stream grows.
    time("sequence_chunks") {
      graft.llm.SamplingOps.sequenceChunks(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // Graph family (round-9): the staged build is the once-per-corpus
    // pipeline stage (fact scan + two shuffles); the triangle probe
    // rides the staged oriented edges. Disjoint-replica fixture ⇒ both
    // lines must scale ~linearly with the decade; the probe's memory is
    // bounded by the O(√m) orientation regardless.
    time("graph_index_build") {
      graft.ops.GraphIndex.ensure(spark, dir)
      ()
    }
    time("triangle_counts") {
      graft.ops.GraphOps.triangleCounts(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // Round-14: the add-batch degree profile (q194). Base-side edge
    // derivation dominates (corpus-linear scan + within-order
    // self-join, bounded per order by its line count); the claim is
    // that the decade slope stays ~linear — nothing in the split/
    // merge/dedup adds a superlinear term over the full derivation.
    time("degree_add_batch") {
      graft.ops.GraphOps.degreeAddBatch(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // Interchange (round-8): each export is one corpus pass; ingest
    // parallelism = file count for JSONL, while CSV's multiLine mode
    // parses each file as ONE unit — the slope gap between the two
    // ingest lines at the same decade is the measured form of the
    // Interchange scaladoc's "JSONL over CSV for text" argument.
    // Round-8 measurements (synthetic soak, this harness): CSV ingest
    // grew ~21× per corpus decade vs JSONL's ~linear slope — the
    // crossover where CSV stops being viable for text corpora is
    // around the 100× decade; the GUARD line below prints the measured
    // ratio at the current decade so future readers pick JSONL on
    // numbers, not rhetoric (a ratio >10 is the red zone).
    val docsSchema = graft.schema.Schemas.fixture("documents")
    val ingestSecs = scala.collection.mutable.Map.empty[String, Double]
    for (fmt <- Seq("jsonl", "csv")) {
      time(s"${fmt}_export") {
        graft.sources.Interchange.ensure(spark, dir, fmt)
        ()
      }
      time(s"${fmt}_ingest") {
        val t0 = System.nanoTime()
        graft.sources.Interchange.readBack(spark,
            graft.sources.Interchange.ensure(spark, dir, fmt), fmt, docsSchema)
          .write.format("noop").mode("overwrite").save()
        ingestSecs(fmt) = (System.nanoTime() - t0) / 1e9
      }
    }
    for (j <- ingestSecs.get("jsonl"); c <- ingestSecs.get("csv")) {
      val ratio = if (j > 0) c / j else Double.NaN
      println(f"[soak] GUARD csv_ingest/jsonl_ingest = $ratio%.1fx at this " +
        "decade (super-linear CSV slope: >10x means CSV is past its " +
        "viability crossover for this corpus size; use JSONL)")
    }
    spark.stop()
  }
}
