package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{IvfIndex, MediaFpIndex, MultimodalOps, PostingIndex, RetrievalOps, SelectionOps, SemDedupIndex, VectorOps}
import graft.streaming.{StreamingClassifierMaintenance, StreamingGraphMaintenance, StreamingIvfMaintenance, StreamingMediaMaintenance, StreamingParagraphMaintenance, StreamingPostingMaintenance, StreamingSemDedupMaintenance, StreamingSketchMaintenance}

/** The streaming-maintenance matrix, closed: postings, IVF lists, and
  * SemDedup components each grow under continuous ingest and must end
  * in EXACTLY the state their single-shot add-batch twin (q132, q106,
  * q171) produces — each of which is itself pinned to a from-scratch
  * full-corpus build by the driver oracle. Arrivals are the standard
  * mod-10 ingest batch split into three files. */
class StreamingPostingMaintenanceSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def batchDocs = graft.Tables.tSpread(spark, dir, "documents")
    .filter(pmod(col("doc_id"), lit(10)) === 7).select("doc_id", "text")

  test("streamed posting delta ranks exactly like the full-corpus build") {
    val root = java.nio.file.Files.createTempDirectory("spm").toString
    val in = s"$root/in"; val delta = s"$root/delta"
    new java.io.File(in).mkdirs()
    val idx = PostingIndex.ensure(spark, dir, PostingIndex.Boundary.ingestMod10)
    val ids = batchDocs.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0))
    var arrivals = 0
    def arrive(part: Seq[Long]): Unit = {
      arrivals += 1
      val staging = java.nio.file.Files.createTempDirectory(s"spm-a$arrivals")
      batchDocs.filter(col("doc_id").isin(part: _*))
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val it = java.nio.file.Files.list(staging).iterator()
      var p: java.nio.file.Path = null
      while (it.hasNext) { val f = it.next(); if (f.toString.endsWith(".parquet")) p = f }
      java.nio.file.Files.copy(p,
        java.nio.file.Paths.get(in, s"arrival$arrivals.parquet"))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val tertile = ids.grouped((ids.length + 2) / 3).toSeq
    arrive(tertile(0))
    val q = spark.readStream.schema(schema).parquet(in)
      .writeStream
      .foreachBatch(StreamingPostingMaintenance.postingMaintain(delta) _)
      .start()
    try {
      q.processAllAvailable()
      arrive(tertile(1)); q.processAllAvailable()
      arrive(tertile(2)); q.processAllAvailable()
    } finally q.stop()
    val got = StreamingPostingMaintenance.bm25StreamedProbe(spark, idx, delta)
      .collect().map(_.toSeq)
    val want = RetrievalOps.bm25Search(spark, dir).collect().map(_.toSeq)
    assert(want.nonEmpty && got.toSeq == want.toSeq,
      s"streamed BM25 drifted from the full-corpus ranking")
  }

  test("posting replay is idempotent (additive segments, batch-keyed overwrite)") {
    val root = java.nio.file.Files.createTempDirectory("spm-replay").toString
    val delta = s"$root/delta"
    val fn = StreamingPostingMaintenance.postingMaintain(delta) _
    val b = batchDocs.limit(20)
    def snap(sub: String) = spark.read.parquet(s"$delta/b0/$sub").collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    fn(b, 0L)
    val before = Seq("postings", "doclen", "df", "stats").map(snap)
    fn(b, 0L)
    val after = Seq("postings", "doclen", "df", "stats").map(snap)
    assert(before == after, "replayed posting segments drifted")
    assert(before.head.nonEmpty, "vacuous replay check")
  }
}

/** Streamed classifier-counts maintenance must refit to EXACTLY the
  * from-scratch full-corpus fit (q183, oracle-backed): counts are
  * mergeable integers, so base ∪ delta → merge → log-odds must be
  * bit-identical to fitting the whole corpus at once. The SUM algebra
  * cannot absorb re-delivered docs by itself, so the maintainer's
  * enforced exclusion (anti-join against base ∪ earlier docs/
  * segments) is pinned here with the paragraph family's three legs:
  * stream ≡ batch, replay idempotence, re-delivery harmlessness. */
class StreamingClassifierMaintenanceSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def batchDocs = graft.Tables.tSpread(spark, dir, "documents")
    .filter(pmod(col("doc_id"), lit(10)) === 7).select("doc_id", "text")

  test("streamed counts refit scores exactly like the full-corpus fit; " +
      "replay and re-delivery both leave the fit fixed") {
    val root = java.nio.file.Files.createTempDirectory("scm").toString
    val delta = s"$root/delta"
    val docs = graft.Tables.tSpread(spark, dir, "documents")
    val baseDocs = docs.filter(pmod(col("doc_id"), lit(10)) =!= 7)
    val baseCounts = graft.Materialize.stable(
      SelectionOps.classifierCounts(baseDocs))
    val baseSeen = graft.Materialize.stable(baseDocs.select("doc_id"))
    val ids = batchDocs.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0))
    val fn = StreamingClassifierMaintenance
      .classifierMaintain(delta, Some(baseSeen)) _
    ids.grouped((ids.length + 2) / 3).zipWithIndex.foreach { case (part, i) =>
      fn(batchDocs.filter(col("doc_id").isin(part: _*)), i.toLong)
    }
    def probe() = StreamingClassifierMaintenance
      .scoredProbe(spark, dir, baseCounts, delta)
      .collect().map(_.toSeq)
    val want = SelectionOps.qualityClassifier(spark, dir)
      .collect().map(_.toSeq)
    val got = probe()
    assert(want.nonEmpty && got.toSeq == want.toSeq,
      "streamed classifier refit drifted from the full-corpus fit")
    // replay: the strictly-before seen-set read means a replayed batch
    // never sees its own crashed attempt's docs/ segment, so both
    // segments land byte-identical
    def snap(sub: String) = spark.read.parquet(s"$delta/b0/$sub").collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val before = (snap("counts"), snap("docs"))
    fn(batchDocs.filter(col("doc_id").isin(
      ids.take((ids.length + 2) / 3): _*)), 0L)
    assert((snap("counts"), snap("docs")) == before,
      "replayed classifier segments drifted")
    assert(before._1.nonEmpty, "vacuous replay check")
    // re-delivery: already-counted docs landing again under NEW batch
    // ids — a recrawl re-delivering stream docs (batch 99) and base
    // docs (batch 100) — must not double-count any teacher bucket
    fn(batchDocs.filter(col("doc_id").isin(
      ids.take((ids.length + 2) / 3): _*)), 99L)
    fn(baseDocs.select("doc_id", "text").limit(50), 100L)
    assert(probe().toSeq == want.toSeq,
      "re-delivered docs double-counted teacher buckets")
    // the enforced exclusion folded both re-delivered batches to empty
    assert(spark.read.schema("doc_id LONG")
      .parquet(s"$delta/b99/docs", s"$delta/b100/docs").count() == 0L,
      "re-delivered batches wrote non-empty docs segments")
    // and it must still hold when the seen set lives in a folded TIER,
    // not live b-dirs: compact everything below 200, then re-deliver
    graft.streaming.DeltaDirs.compact(spark, delta,
      Seq("counts" -> org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bucket",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("cp",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cn",
          org.apache.spark.sql.types.LongType))),
        "docs" -> org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType)))), 200L)
    fn(batchDocs.filter(col("doc_id").isin(
      ids.take((ids.length + 2) / 3): _*)), 200L)
    assert(probe().toSeq == want.toSeq,
      "re-delivery against a compacted seen set double-counted")
    assert(spark.read.schema("doc_id LONG")
      .parquet(s"$delta/b200/docs").count() == 0L,
      "re-delivered batch after compaction wrote a non-empty docs segment")
  }
}

/** Streamed media-fingerprint maintenance must pair EXACTLY like the
  * from-scratch full-corpus run (q182, oracle-backed pair-for-pair
  * against DuckDB brute force). */
class StreamingMediaMaintenanceSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def batchDocs = graft.Tables.tSpread(spark, dir, "documents")
    .filter(pmod(col("doc_id"), lit(10)) === 7).select("doc_id", "text")

  test("streamed fingerprint delta pairs exactly like the full corpus") {
    val root = java.nio.file.Files.createTempDirectory("smm").toString
    val delta = s"$root/delta"
    MediaFpIndex.ensure(spark, dir)
    val base = MediaFpIndex.fps(spark, dir)
    val ids = batchDocs.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0))
    val fn = StreamingMediaMaintenance.mediaMaintain(delta) _
    ids.grouped((ids.length + 2) / 3).zipWithIndex.foreach { case (part, i) =>
      fn(batchDocs.filter(col("doc_id").isin(part: _*)), i.toLong)
    }
    val got = StreamingMediaMaintenance.pairsProbe(spark, base, delta)
      .collect().map(_.toSeq)
    val want = MultimodalOps.mediaPerceptualNearDup(spark, dir)
      .collect().map(_.toSeq)
    assert(want.nonEmpty && got.toSeq == want.toSeq,
      "streamed media pairs drifted from the full-corpus run")
    // replay: additive segments, batch-keyed overwrite ⇒ byte-identical
    def snap() = spark.read.parquet(s"$delta/b1/fps").collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val t1 = ids.grouped((ids.length + 2) / 3).toSeq(1)
    val before = snap()
    fn(batchDocs.filter(col("doc_id").isin(t1: _*)), 1L)
    assert(snap() == before, "replayed fps segment drifted")
  }
}

/** The ELEVENTH maintainer family, added as harness CONFIG (r14
  * verdict item 6's done-claim): streamed audio-fingerprint state must
  * report exactly like the fresh full-corpus q196 (oracle-backed) and
  * the staged add-batch q197. All three legs pinned. */
class StreamingAudioMaintenanceSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def batchDocs = graft.Tables.tSpread(spark, dir, "documents")
    .filter(pmod(col("doc_id"), lit(10)) === 7).select("doc_id", "text")

  test("streamed audio fingerprints report exactly like the full corpus; " +
      "replay and re-delivery both leave the report fixed") {
    val root = java.nio.file.Files.createTempDirectory("sam").toString
    val delta = s"$root/delta"
    val base = MediaFpIndex.audioFps(spark, dir)
    val ids = batchDocs.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0))
    val fn = graft.streaming.StreamingAudioMaintenance.audioMaintain(delta) _
    val thirds = ids.grouped((ids.length + 2) / 3).toSeq
    thirds.zipWithIndex.foreach { case (part, i) =>
      fn(batchDocs.filter(col("doc_id").isin(part: _*)), i.toLong)
    }
    def probe() = graft.streaming.StreamingAudioMaintenance
      .reportProbe(spark, base, delta).collect().map(_.toSeq)
    val want = MultimodalOps.audioPerceptualNearDup(spark, dir)
      .collect().map(_.toSeq)
    val got = probe()
    assert(want.nonEmpty && got.toSeq == want.toSeq,
      "streamed audio report drifted from the full-corpus q196")
    // replay: additive segments, batch-keyed overwrite ⇒ byte-identical
    def snap() = spark.read.parquet(s"$delta/b1/fps").collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val before = snap()
    fn(batchDocs.filter(col("doc_id").isin(thirds(1): _*)), 1L)
    assert(snap() == before, "replayed audio fps segment drifted")
    assert(before.nonEmpty, "vacuous replay check")
    // re-delivery: the SAME docs under a NEW batchId land duplicate
    // keyed rows the probe's dedup must absorb (presence algebra)
    fn(batchDocs.filter(col("doc_id").isin(thirds.head: _*)), 99L)
    assert(probe().toSeq == want.toSeq,
      "re-delivered docs corrupted the audio report")
  }
}

class StreamingIvfMaintenanceSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  test("stream-grown IVF delta probes exactly like the single-shot add-batch") {
    val root = java.nio.file.Files.createTempDirectory("sim-ivf").toString
    val delta = s"$root/delta"
    val idx = IvfIndex.ensure(spark, dir)
    val lists = spark.read.parquet(s"$idx/lists")
    val centroids = spark.read.parquet(s"$idx/centroids")
    val isNew = pmod(col("vec_id"), lit(10)) === 7
    val baseLists = lists.filter(!isNew)
    val batch = graft.Tables.tSpread(spark, dir, "embeddings")
      .filter(isNew).select("vec_id", "embedding")
    val ids = batch.select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    val fn = StreamingIvfMaintenance.ivfMaintain(centroids, delta) _
    ids.grouped((ids.length + 2) / 3).zipWithIndex.foreach { case (part, i) =>
      fn(batch.filter(col("vec_id").isin(part: _*)), i.toLong)
    }
    val got = StreamingIvfMaintenance
      .probeWithDelta(spark, baseLists, centroids, delta)
      .collect().map(_.toSeq)
    val want = VectorOps.ivfAddBatch(spark, dir).collect().map(_.toSeq)
    assert(want.nonEmpty && got.toSeq == want.toSeq,
      "streamed IVF probe drifted from q106's add-batch")
    // replay: same batch id, byte-identical segment
    def snap() = spark.read.parquet(s"$delta/b0/lists").collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val before = snap()
    fn(batch.filter(col("vec_id").isin(ids.take((ids.length + 2) / 3): _*)), 0L)
    assert(snap() == before, "replayed IVF segment drifted")
    // re-delivery: the SAME vec_ids landing again under a NEW batchId
    // must be excluded by the first-seen anti-join (VERDICT r14 feeder
    // audit) — the segment folds to empty and the probe stays fixed
    fn(batch.filter(col("vec_id").isin(ids.take((ids.length + 2) / 3): _*)), 99L)
    assert(spark.read.schema("vec_id long, cell int, v array<float>, norm double")
      .parquet(s"$delta/b99/lists").count() == 0,
      "re-delivered vectors were not excluded from the IVF delta")
    val got2 = StreamingIvfMaintenance
      .probeWithDelta(spark, baseLists, centroids, delta)
      .collect().map(_.toSeq)
    assert(got2.toSeq == want.toSeq,
      "re-delivered vectors corrupted the IVF probe")
  }
}

class StreamingSemDedupMaintenanceSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  test("stream-grown components equal the staged add-batch cluster table") {
    val root = java.nio.file.Files.createTempDirectory("sim-sd").toString
    val delta = s"$root/delta"
    SemDedupIndex.ensure(spark, dir)
    val staged = SemDedupIndex.components(spark, dir)
    val emb = graft.Tables.tSpread(spark, dir, "embeddings")
    // The maintainer takes the PREPARED corpus side — the staged
    // SemDedupIndex corpus/ table (label, vec_id, v, norm) — so the
    // spec exercises the exact production read path (and the
    // per-batch full-corpus norm recompute stays gone).
    val basePrepared = SemDedupIndex.corpus(spark, dir)
    val batch = emb.filter(pmod(col("vec_id"), lit(10)) === 7)
      .select("label", "vec_id", "embedding")
    val ids = batch.select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    val fn = StreamingSemDedupMaintenance.semDedupMaintain(basePrepared, delta) _
    ids.grouped((ids.length + 2) / 3).zipWithIndex.foreach { case (part, i) =>
      fn(batch.filter(col("vec_id").isin(part: _*)), i.toLong)
    }
    val got = StreamingSemDedupMaintenance
      .componentsWithDelta(spark, basePrepared, staged, delta)
      .collect().map(_.toSeq)
    val want = VectorOps.semanticDedupStaged(spark, dir).collect().map(_.toSeq)
    assert(want.nonEmpty && got.toSeq == want.toSeq,
      "streamed semdedup components drifted from q171")
    // replay: edges for a re-run batch must not see the batch's own
    // delta vecs (strictly-before read), so the segment is stable
    def snap(sub: String) = spark.read.parquet(s"$delta/b1/$sub").collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val t1 = ids.grouped((ids.length + 2) / 3).toSeq(1)
    val before = (snap("edges"), snap("vecs"))
    fn(batch.filter(col("vec_id").isin(t1: _*)), 1L)
    assert((snap("edges"), snap("vecs")) == before,
      "replayed semdedup segments drifted")
    // re-delivery: the SAME vec_ids landing again under a NEW batchId
    // must be excluded by the first-seen anti-join (VERDICT r14 feeder
    // audit) — otherwise their vecs rows duplicate and n_members
    // double-counts. Segment empty, cluster table fixed.
    fn(batch.filter(col("vec_id").isin(t1: _*)), 99L)
    assert(spark.read
      .schema("label int, vec_id long, v array<float>, norm double")
      .parquet(s"$delta/b99/vecs").count() == 0,
      "re-delivered vectors were not excluded from the semdedup delta")
    val got2 = StreamingSemDedupMaintenance
      .componentsWithDelta(spark, basePrepared, staged, delta)
      .collect().map(_.toSeq)
    assert(got2.toSeq == want.toSeq,
      "re-delivered vectors corrupted the semdedup cluster table")
  }
}

/** Streamed overlap-sketch maintenance must estimate EXACTLY like the
  * whole-corpus sketch (q192, oracle-backed): min-of-mins is a
  * lossless merge, so staged base ∪ streamed delta → min-merge →
  * all-pairs estimate must be byte-identical to sketching the corpus
  * at once. The MIN algebra shares the paragraph family's re-delivery
  * immunity; all three legs pinned. */
class StreamingSketchMaintenanceSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def batchDocs = graft.Tables.tSpread(spark, dir, "documents")
    .filter(pmod(col("doc_id"), lit(10)) === 7)
    .select("doc_id", "source", "text")

  test("streamed sketch estimates exactly like the whole-corpus sketch; " +
      "replay and re-delivery both leave the estimate fixed") {
    val root = java.nio.file.Files.createTempDirectory("ssk").toString
    val delta = s"$root/delta"
    graft.llm.OverlapSketchIndex.ensure(spark, dir)
    val base = graft.llm.OverlapSketchIndex.sketch(spark, dir)
    val ids = batchDocs.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0))
    val fn = StreamingSketchMaintenance.sketchMaintain(delta) _
    val thirds = ids.grouped((ids.length + 2) / 3).toSeq
    thirds.zipWithIndex.foreach { case (part, i) =>
      fn(batchDocs.filter(col("doc_id").isin(part: _*)), i.toLong)
    }
    def probe() = StreamingSketchMaintenance
      .overlapProbe(spark, base, delta).collect().map(_.toSeq)
    // q192 (oracle-backed) is itself the whole-corpus estimate by its
    // staged ≡ inline contract, so the stream is anchored to the oracle
    val want = graft.llm.CorpusAudit.sourceOverlapSketchStaged(spark, dir)
      .collect().map(_.toSeq)
    val got = probe()
    assert(want.nonEmpty && got.toSeq == want.toSeq,
      "streamed overlap sketch drifted from the whole-corpus sketch")
    // replay: additive segments, batch-keyed overwrite => byte-identical
    def snap() = spark.read.parquet(s"$delta/b0/sketch").collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val before = snap()
    fn(batchDocs.filter(col("doc_id").isin(thirds.head: _*)), 0L)
    assert(snap() == before, "replayed sketch segment drifted")
    assert(before.nonEmpty, "vacuous replay check")
    // re-delivery: the SAME docs landing again under a NEW batchId add
    // duplicate min candidates that the MIN algebra must absorb
    fn(batchDocs.filter(col("doc_id").isin(thirds.head: _*)), 99L)
    assert(probe().toSeq == want.toSeq,
      "re-delivered docs corrupted the overlap sketch")
  }
}

/** Streamed co-purchase edge maintenance must profile EXACTLY like the
  * from-scratch full-corpus derivation (q151/q194, oracle-backed):
  * every edge derives from within one order, so whole-order arrivals
  * decompose the edge set exactly, and the probe's (u, v) dedup gives
  * re-delivery immunity. All three legs pinned. */
class StreamingGraphMaintenanceSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def inc = graft.Tables.t(spark, dir, "lineitem")
    .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))

  test("streamed edge set profiles exactly like the full corpus; " +
      "replay and re-delivered orders both leave the profile fixed") {
    val root = java.nio.file.Files.createTempDirectory("sgm").toString
    val delta = s"$root/delta"
    val isNewOrder = pmod(col("o"), lit(10)) === 7
    val base = graft.Materialize.stable(
      graft.ops.GraphOps.edgesOf(inc.filter(!isNewOrder)))
    // WHOLE orders per batch (the arrival contract): third the distinct
    // new ORDER ids, not the incidence rows
    val orderIds = inc.filter(isNewOrder).select("o").distinct()
      .orderBy("o").collect().map(_.getLong(0))
    val fn = StreamingGraphMaintenance.graphMaintain(delta) _
    val thirds = orderIds.grouped((orderIds.length + 2) / 3).toSeq
    thirds.zipWithIndex.foreach { case (part, i) =>
      fn(inc.filter(col("o").isin(part: _*)), i.toLong)
    }
    def probe() = StreamingGraphMaintenance
      .degreeProbe(spark, base, delta).collect().map(_.toSeq)
    val want = graft.ops.GraphOps.degreeProfile(spark, dir)
      .collect().map(_.toSeq)
    val got = probe()
    assert(want.nonEmpty && got.toSeq == want.toSeq,
      "streamed degree profile drifted from the full-corpus derivation")
    // replay: additive segments, batch-keyed overwrite => byte-identical
    def snap() = spark.read.parquet(s"$delta/b0/edges").collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val before = snap()
    fn(inc.filter(col("o").isin(thirds.head: _*)), 0L)
    assert(snap() == before, "replayed edges segment drifted")
    assert(before.nonEmpty, "vacuous replay check")
    // re-delivery: the SAME orders landing again under a NEW batchId
    // add duplicate (u, v) rows the probe's keyed dedup must absorb
    fn(inc.filter(col("o").isin(thirds.head: _*)), 99L)
    assert(probe().toSeq == want.toSeq,
      "re-delivered orders corrupted the degree profile")
  }

  test("an order SPLIT across two micro-batches is repaired exactly: " +
      "the cross-batch co-purchase edges land (VERDICT r14 item 1)") {
    val root = java.nio.file.Files.createTempDirectory("sgm-split").toString
    val delta = s"$root/delta"
    val isNewOrder = pmod(col("o"), lit(10)) === 7
    val base = graft.Materialize.stable(
      graft.ops.GraphOps.edgesOf(inc.filter(!isNewOrder)))
    val newInc = inc.filter(isNewOrder)
    // the new order with the most distinct parts — the worst victim
    val victim = newInc.select("o", "p").distinct()
      .groupBy("o").count()
      .orderBy(col("count").desc, col("o")).limit(1)
      .collect().head.getLong(0)
    val vParts = newInc.filter(col("o") === victim).select("p").distinct()
      .orderBy("p").collect().map(_.getLong(0))
    assert(vParts.length >= 2, "need a multi-line order to split")
    val (h1, h2) = vParts.splitAt(vParts.length / 2)
    val fn = StreamingGraphMaintenance.graphMaintain(delta) _
    fn(newInc.filter(col("o") =!= victim), 0L)
    fn(newInc.filter(col("o") === victim && col("p").isin(h1: _*)), 1L)
    fn(newInc.filter(col("o") === victim && col("p").isin(h2: _*)), 2L)
    val want = graft.ops.GraphOps.degreeProfile(spark, dir)
      .collect().map(_.toSeq)
    val got = StreamingGraphMaintenance.degreeProbe(spark, base, delta)
      .collect().map(_.toSeq)
    assert(want.nonEmpty && got.toSeq == want.toSeq,
      "split-order arrival lost cross-batch co-purchase edges")
    // and the repair is visible where it must be: the second half's
    // segment carries at least one half1 × half2 pair
    val repair = spark.read.schema("u long, v long")
      .parquet(s"$delta/b2/edges")
      .filter((col("u").isin(h1: _*) && col("v").isin(h2: _*)) ||
        (col("u").isin(h2: _*) && col("v").isin(h1: _*)))
    assert(repair.count() > 0,
      "repair segment carries no cross-half edge — repair did not run")
  }
}

/** Streamed paragraph-digest maintenance must clean a recrawl batch
  * EXACTLY like the split-everything plan (q189, oracle-backed). The
  * family's algebra is set PRESENCE — the one maintainer whose
  * contract survives re-delivered documents — so the spec pins all
  * three legs: stream ≡ batch, replay idempotence, and re-delivery
  * harmlessness (the case the classifier family must exclude
  * upstream). */
class StreamingParagraphMaintenanceSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def side(batch: Boolean) =
    graft.Tables.tSpread(spark, dir, "documents")
      .filter(if (batch) pmod(col("doc_id"), lit(10)) === 7
              else pmod(col("doc_id"), lit(10)) =!= 7)
      .select("doc_id", "text")

  test("streamed digest set cleans exactly like the full split (q189); " +
      "replay and re-delivery both leave the answer fixed") {
    val root = java.nio.file.Files.createTempDirectory("spg").toString
    val delta = s"$root/delta"
    val corpus = side(batch = false)
    val ids = corpus.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0))
    // half the corpus side plays the staged base; the rest streams in
    // three micro-batches
    val (baseIds, streamIds) = ids.splitAt(ids.length / 2)
    val baseDgs = graft.Materialize.stable(graft.llm.TextOps.paraDigests(
      corpus.filter(col("doc_id").isin(baseIds: _*))))
    val fn = StreamingParagraphMaintenance.paragraphMaintain(delta) _
    val thirds = streamIds.grouped((streamIds.length + 2) / 3).toSeq
    thirds.zipWithIndex.foreach { case (part, i) =>
      fn(corpus.filter(col("doc_id").isin(part: _*)), i.toLong)
    }
    def probe() = StreamingParagraphMaintenance
      .cleanedProbe(spark, side(batch = true), baseDgs, delta)
      .collect().map(_.toSeq)
    val want = graft.llm.TextOps.paragraphDedupIncremental(spark, dir)
      .collect().map(_.toSeq)
    val got = probe()
    assert(want.nonEmpty && got.toSeq == want.toSeq,
      "streamed paragraph cleaning drifted from the full split")
    // replay: additive segments, batch-keyed overwrite => byte-identical
    def snap() = spark.read.parquet(s"$delta/b0/dgs").collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val before = snap()
    fn(corpus.filter(col("doc_id").isin(thirds.head: _*)), 0L)
    assert(snap() == before, "replayed digest segment drifted")
    // re-delivery: the SAME docs landing again under a NEW batchId add
    // duplicate digest rows that the presence algebra must absorb
    fn(corpus.filter(col("doc_id").isin(thirds.head: _*)), 99L)
    assert(probe().toSeq == want.toSeq,
      "re-delivered docs corrupted the paragraph digest set")
  }
}
