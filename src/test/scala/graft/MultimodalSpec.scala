package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{MediaHeaders, MultimodalOps}

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("media table carries binary payloads with consistent metadata") {
    val m = MultimodalOps.mediaTable(spark, sfDir)
    assert(m.schema("payload").dataType.typeName == "binary")
    // n_bytes metadata matches actual payload length
    assert(m.filter(length(col("payload")) =!= col("meta.n_bytes")).count() == 0)
  }

  test("feature extraction is deterministic and batch-size invariant") {
    val ds = MultimodalOps.mediaDataset(spark, sfDir)
    val a = MultimodalOps.extractFeatures(ds, batchSize = 64)
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    val b = MultimodalOps.extractFeatures(ds.repartition(5), batchSize = 7)
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    assert(a == b, "batching/partitioning must not change features")
    assert(a.values.forall(_.length == 8))
  }

  test("empty payloads produce zero features, not errors") {
    val empt = MultimodalOps.extractFeatures(MultimodalOps.mediaDataset(spark, sfDir))
      .filter(f => f.n_bytes == 0).collect()
    assert(empt.forall(_.features.forall(_ == 0.0f)))
  }

  test("header parse round-trips the synthesized containers for every format") {
    // q51's oracle is DuckDB arithmetic; this pins the same contract at
    // the unit level: parse(synthesize(doc_id)) recovers the header
    // fields, for all four formats, with ok = true everywhere.
    val parsed = MultimodalOps.mediaDataset(spark, sfDir).collect()
      .map(r => r.doc_id -> MediaHeaders.parse(r.payload)).toMap
    assert(parsed.nonEmpty && parsed.values.forall(_.ok), "parser rejected a synthesized payload")
    parsed.foreach { case (id, p) =>
      (id % 4) match {
        case 0 => assert(p.kind == "jpeg" && p.dim1 == (id * 37 % 1024 + 256) &&
          p.dim2 == (id * 53 % 768 + 144) && p.depth == 8)
        case 1 => assert(p.kind == "png" && p.dim1 == (id * 37 % 1024 + 256) &&
          p.dim2 == (id * 53 % 768 + 144) && p.depth == 8)
        case 2 => assert(p.kind == "wav" && p.dim1 == 8000 * (id % 5 + 1) &&
          p.dim2 == (id % 2 + 1) && p.depth == 16)
        case _ => assert(p.kind == "mp4" && p.dim1 == 600 &&
          p.dim2 == 1500 * (id % 5 + 2) && p.depth == 0)
      }
    }
  }

  test("header parse is loud-by-value on malformed bytes, never throws") {
    // corrupt a png specifically: byte 0 of an mp4 is already 0x00 (ftyp
    // box size high byte), so zeroing it there would be a no-op and the
    // case would silently depend on which row head() returns.
    val png = MultimodalOps.mediaDataset(spark, sfDir)
      .filter(r => r.doc_id % 4 == 1).head().payload
    // mp4 whose mvhd box (size 8) ends EXACTLY at the buffer: every
    // size guard passes, so a version-byte read before the c+28 bounds
    // check indexes one past the array — the regression that violated
    // the loud-by-value contract with an ArrayIndexOutOfBounds.
    def be(i: Int) = Array[Byte](((i >> 24) & 0xff).toByte,
      ((i >> 16) & 0xff).toByte, ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
    val truncatedMvhd = be(8) ++ "ftyp".getBytes("US-ASCII") ++
      be(24) ++ "moov".getBytes("US-ASCII") ++
      be(8) ++ "free".getBytes("US-ASCII") ++
      be(8) ++ "mvhd".getBytes("US-ASCII")
    val cases = Seq[Array[Byte]](
      null, Array.emptyByteArray, Array.fill(11)(0x41.toByte),
      png.take(9),                         // truncated mid-header
      "GARBAGEGARBAGE".getBytes("UTF-8"),  // wrong magic
      { val c = png.clone(); c(0) = 0x00; c }, // corrupted magic
      truncatedMvhd)                       // mvhd ends at the buffer
    cases.foreach(c => assert(!MediaHeaders.parse(c).ok))
  }

  test("resize plan preserves aspect ratio within 224 bound") {
    val r = MultimodalOps.resizePlan(spark, sfDir)
    assert(r.filter(col("out_width") > 224 || col("out_height") > 224).count() == 0)
    assert(r.filter(col("out_width") =!= 224 && col("out_height") =!= 224).count() == 0,
      "longest side should hit the 224 target")
  }

  test("frame sampling explodes one row per frame") {
    val f = MultimodalOps.frameSamplePlan(spark, sfDir)
    val perDoc = f.groupBy("doc_id").count()
    val expected = MultimodalOps.mediaTable(spark, sfDir)
      .filter(col("format") === "mp4")
      .select(col("doc_id"), (col("doc_id") % 5 + 2).as("n"))
    val joined = perDoc.join(expected, "doc_id")
      .filter(col("count") =!= col("n"))
    assert(joined.count() == 0)
  }

  // ---- perceptual payload near-dup (q182) --------------------------------

  import graft.functions.MediaHashKernel.payloadPhash

  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  private def be32(i: Int) = Array(((i >> 24) & 0xff).toByte,
    ((i >> 16) & 0xff).toByte, ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
  private def le32(i: Int) = be32(i).reverse
  private def le16(i: Int) = Array((i & 0xff).toByte, ((i >> 8) & 0xff).toByte)

  private def pngWrap(body: Array[Byte]): Array[Byte] =
    hexBytes("89504E470D0A1A0A" + "0000000D" + "49484452") ++
      be32(100) ++ be32(50) ++ hexBytes("080200000000000000") ++ body
  private def wavWrap(body: Array[Byte]): Array[Byte] =
    "RIFF".getBytes ++ le32(body.length + 36) ++ "WAVEfmt ".getBytes ++
      le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
      le16(2) ++ le16(16) ++ "data".getBytes ++ le32(body.length) ++ body

  test("body offset walks every synthesized container to its signal bytes") {
    MultimodalOps.mediaDataset(spark, sfDir).collect().foreach { r =>
      val off = MediaHeaders.bodyOffset(r.payload)
      assert(off >= 0, s"walk failed for doc ${r.doc_id}")
      val expectedHdr = (r.doc_id % 4) match {
        case 0 => 39; case 1 => 33; case 2 => 44; case _ => 144
      }
      assert(off == expectedHdr, s"doc ${r.doc_id}: offset $off")
    }
  }

  test("perceptual hash is a content fingerprint: container metadata never leaks in") {
    val body = ("the quick brown fox jumps over the lazy dog " * 7).getBytes("UTF-8")
    val asPng = payloadPhash(pngWrap(body))
    val asWav = payloadPhash(wavWrap(body))
    assert(asPng >= 0 && asPng == asWav,
      "same signal in different containers must fingerprint identically")
  }

  test("planted near-identical payloads land within the Hamming-3 verify " +
      "threshold; unrelated payloads far outside") {
    val base = ("a scan batch order big spark join group stream data vector " +
      "query column window table hash slow small sort merge value " * 5).getBytes("UTF-8")
    // the fixture's planted-clone shape: a small tail edit
    val tailEdit = base.clone()
    ("drop " + "x").getBytes.copyToArray(tailEdit, tailEdit.length - 6)
    val unrelated = ("entirely different words about completely other topics " +
      "nothing shared with the base document at all " * 6).getBytes("UTF-8")
    val hBase = payloadPhash(pngWrap(base))
    val hEdit = payloadPhash(pngWrap(tailEdit))
    val hOther = payloadPhash(pngWrap(unrelated))
    val near = java.lang.Long.bitCount(hBase ^ hEdit)
    val far = java.lang.Long.bitCount(hBase ^ hOther)
    assert(near <= 3, s"tail-edited clone at hamming $near")
    assert(far > 3, s"unrelated payloads at hamming $far")
    // exact clone pairs at distance 0 by construction
    assert(payloadPhash(wavWrap(base.clone())) == payloadPhash(wavWrap(base)))
  }

  test("perceptual hash sentinels: malformed container and sub-gram body") {
    assert(payloadPhash("not a container at all".getBytes) == -1L)
    assert(payloadPhash(pngWrap("tiny".getBytes)) == -1L,
      "body below one 8-byte gram cannot fingerprint")
    assert(payloadPhash(null) == -1L)
  }

  test("banded near-dup retrieval equals spec-side brute force (pigeonhole exactness)") {
    val fps = MultimodalOps.mediaDataset(spark, sfDir).collect()
      .map(r => r.doc_id -> payloadPhash(r.payload))
      .filter(_._2 != -1L)
    val brute = (for {
      (a, fa) <- fps; (b, fb) <- fps
      if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val got = MultimodalOps.mediaPerceptualNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute, s"banded=${got.size} brute=${brute.size}")
  }

  // scala twin of MultimodalOps.hammingBandKeys: 20 keys, one per
  // 3-of-6 block triple
  private def scalaBandKeys(fp: Long): Seq[(Int, Long)] = {
    val blk = (0 until 6).map(i => (fp >>> (i * 10)) & 0x3FFL)
    (0 until 6).combinations(3).toSeq.zipWithIndex.map { case (t, bno) =>
      (bno, blk(t(0)) | (blk(t(1)) << 10) | (blk(t(2)) << 20))
    }
  }

  test("combinatorial 3-of-6 banding: EVERY <=3-bit flip shares a key " +
      "(exhaustive pigeonhole), 4 bits in 4 blocks does not") {
    val base = 0x0ABCDEF123456789L & ((1L << 60) - 1)
    val baseKeys = scalaBandKeys(base).toSet
    def sharesKey(other: Long) =
      scalaBandKeys(other).exists(baseKeys.contains)
    // exhaustive over all 1-, 2-, 3-bit flips of a 60-bit fingerprint:
    // 60 + 1770 + 34220 variants, incl. every adversarial placement
    // (3 bits in 3 distinct blocks)
    for (c <- Seq(1, 2, 3); bits <- (0 until 60).combinations(c)) {
      val v = bits.foldLeft(base)((f, b) => f ^ (1L << b))
      assert(sharesKey(v), s"missed flip of bits $bits")
    }
    // 4 bits spread over 4 distinct blocks leave only 2 intact blocks —
    // no full triple survives, so no key collides (these pairs are
    // outside the Hamming-3 contract; the exact verify would drop them
    // anyway)
    val spread4 = base ^ (1L << 0) ^ (1L << 10) ^ (1L << 20) ^ (1L << 30)
    assert(!sharesKey(spread4))
  }

  test("column-form band keys agree with the scala twin (fused-key " +
      "kernel decodes to the same (bno, bval) pairs)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode}
    val fps = (0 until 128).map(i =>
      (0x0123456789ABCDEFL * (i + 1) + 0x9E3779B97F4A7C15L * i) &
        ((1L << 60) - 1))
    val got = fps.toDF("fp")
      .select(col("fp"), explode(MultimodalOps.hammingBandKeys(col("fp"))).as("bk"))
      .select(col("fp"), MultimodalOps.bandNo(col("bk")),
        MultimodalOps.bandVal(col("bk")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = fps.flatMap(fp =>
      scalaBandKeys(fp).map { case (bno, bval) => (fp, bno, bval) }).toSet
    assert(got == want)
    // the wide kernel's 120 keys: C(10,7) subsets in combinations
    // order, 6-bit blocks packed low-to-high — pin one fingerprint
    // against an independent scala recomputation
    val fp0 = fps.head
    val wideGot = Seq(fp0).toDF("fp")
      .select(explode(MultimodalOps.hammingBandKeysWide(col("fp"))).as("bk"))
      .select(MultimodalOps.bandNo(col("bk")), MultimodalOps.bandVal(col("bk")))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val wideWant = (0 until 10).combinations(7).toSeq.zipWithIndex.map {
      case (t, bno) =>
        (bno, t.zipWithIndex.map { case (b, k) =>
          ((fp0 >>> (b * 6)) & 0x3FL) << (6 * k) }.reduce(_ | _))
    }.toSet
    assert(wideGot == wideWant)
  }

  test("saturated-bucket counter: empty on the fixture, fires on a " +
      "synthetic hot-bucket corpus (r12 verdict item 2)") {
    import spark.implicits._
    // fixture: the shipped corpus must band sparsely
    val fixtureFps = MultimodalOps.mediaFps(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    assert(MultimodalOps.saturatedMediaBuckets(fixtureFps).isEmpty,
      "shipped fixture must not saturate any media bucket")
    // synthetic hot bucket: 151 distinct fingerprints sharing blocks
    // 0-2 (bits 0-29) with EVERY high block (3, 4 and 5) varying per
    // fingerprint — so they all land in ONE bucket of the (0,1,2)
    // triple while every triple touching a high block scatters into
    // singletons. 151 > SaturatedBucket=100 fires it.
    val base = 0x15A4E35L // low 30 bits shared
    val hot = (1 to 151)
      .map(i => base | (i.toLong << 30) | (i.toLong << 40) | (i.toLong << 50))
      .toDF("fp")
      .withColumn("doc_id", col("fp")) // shape only; ids unused
    val fired = MultimodalOps.saturatedMediaBuckets(hot).collect()
    assert(fired.length == 1, fired.mkString(","))
    assert(fired(0).getLong(2) == 151L)
    // bno 0 is the (0,1,2) triple in combinations order; its bval is
    // exactly the shared low 30 bits
    assert(fired(0).getInt(0) == 0 && fired(0).getLong(1) == base.toLong)
  }

  // ---- audio energy-profile fingerprint (q196) ---------------------------

  test("audio fingerprint is gain-invariant (the Haitsma-Kalker property " +
      "the byte-gram hash lacks) and rejects non-wav/short input") {
    import graft.functions.MediaHashKernel.audioPhash
    // 200 samples of a deterministic signed waveform, |s| <= 1000 so a
    // 4x gain stays far from clipping
    def pcm(gain: Int): Array[Byte] = (0 until 200).flatMap { j =>
      val s = ((j * 37 % 101) - 50) * 20 * gain
      le16(s & 0xffff).toSeq
    }.toArray
    val fp1 = audioPhash(wavWrap(pcm(1)))
    val fp4 = audioPhash(wavWrap(pcm(4)))
    assert(fp1 >= 0 && fp1 == fp4,
      "uniform gain must not change the energy-difference sign profile")
    // the byte-gram hash, by contrast, sees every byte change: far
    // outside the Hamming-3 verify window (the documented complement)
    val g1 = payloadPhash(wavWrap(pcm(1)))
    val g4 = payloadPhash(wavWrap(pcm(4)))
    assert(java.lang.Long.bitCount(g1 ^ g4) > 3,
      "gain clone should NOT be a byte-gram near-dup (complementarity)")
    // sentinels: non-wav container, too-short body
    assert(audioPhash(pngWrap(pcm(1))) == -1L, "png must sentinel")
    assert(audioPhash(wavWrap(pcm(1).take(100))) == -1L,
      "fewer than 61 samples must sentinel")
    // trailing chunks after `data` are metadata, not PCM (ADVICE r15):
    // the walk is bounded by the data chunk's DECLARED size, so an
    // appended LIST/INFO chunk must not perturb the fingerprint
    val withList = wavWrap(pcm(1)) ++ "LIST".getBytes ++ le32(8) ++
      "INFOjunk".getBytes
    assert(audioPhash(withList) == fp1,
      "trailing LIST chunk bytes must not hash as PCM samples")
  }

  test("wide 7-of-10 banding: pigeonhole-exact at Hamming <= 3 " +
      "(adversarial flips) and pair-identical to the narrow banding") {
    import spark.implicits._
    // adversarial: flip every 3-subset of bit positions spread across
    // three DIFFERENT 6-bit blocks (the worst case for block survival)
    val base = 0x0FA3C5196E2D7BL & ((1L << 60) - 1)
    val flips = Seq(Seq(1, 13, 47), Seq(0, 59, 30), Seq(5, 11, 17),
      Seq(58, 52, 46), Seq(2, 3, 4))
    val fps = (base +: flips.map(_.foldLeft(base)((f, b) => f ^ (1L << b))))
      .zipWithIndex.map { case (fp, i) => (i.toLong, fp) }
      .toDF("doc_id", "fp")
    val widePairs = MultimodalOps.fpPairs(fps, wide = true)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every flipped variant is within Hamming 3 of base -> must pair
    flips.indices.foreach { i =>
      assert(widePairs.contains((0L, (i + 1).toLong)),
        s"wide banding missed a Hamming-3 pair (flip set $i)")
    }
    // and on the fixture the two bandings emit the SAME report
    // (banding is retrieval, not semantics)
    val afps = MultimodalOps.audioFps(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val narrow = MultimodalOps.fpNeighborReport(afps)
      .collect().map(_.toSeq).toSeq
    val wide = MultimodalOps.fpNeighborReport(afps, wide = true)
      .collect().map(_.toSeq).toSeq
    assert(narrow.nonEmpty && narrow == wide,
      "wide and narrow bandings must produce identical reports")
  }

  test("wide band stage stays inside codegen (r16 verdict item 1: the " +
      "120 inline subset expressions used to blow janino's 64 KB method " +
      "limit and run interpreted; the fused kernel must not)") {
    import spark.implicits._
    val fps = graft.Materialize.stable(
      (1 to 500).map(i => (i.toLong, (i.toLong * 0x9E3779B97F4A7C15L) &
        ((1L << 60) - 1))).toDF("doc_id", "fp"))
    try {
      // make any codegen failure (janino limits included) throw instead
      // of silently falling back to interpreted execution
      spark.conf.set("spark.sql.codegen.fallback", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      assert(MultimodalOps.fpPairs(fps, wide = true).count() >= 0L)
      assert(MultimodalOps.fpNeighborReport(fps, wide = true).count() == 500L)
    } finally {
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("banding width is a plan-time decision (r15 verdict item 1): " +
      "sparse and below-break-even corpora stay narrow, a saturating " +
      "corpus arms the wide path, the auto output is banding-invariant, " +
      "and spark.graft.bandBreakEven flips the decision (r16 item 4)") {
    import spark.implicits._
    val BE = MultimodalOps.WideBreakEvenCandPerFp
    // the shipped fixture bands sparsely -> narrow
    val fixtureFps = MultimodalOps.audioFps(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    assert(!MultimodalOps.wideBandingNeeded(fixtureFps),
      "sparse fixture must choose narrow banding")
    // hotCorpus(n): n fps varying ONLY in bits 30-39 (narrow block 3,
    // requires n <= 1023) share blocks {0,1,2,4,5} -> exactly the
    // C(5,3) = 10 triples avoiding block 3 each collapse to ONE bucket
    // of n fps (every triple touching block 3 scatters), so the narrow
    // candidate sum is exactly 10 * n(n-1)/2 and C/D = 10(n-1)/2 —
    // the fixture arithmetic is exact, not approximate (ADVICE r16:
    // the old 3100-fp fixture leaked into block 4 and its comment
    // understated C/D ~4x).
    def hotCorpus(n: Int): org.apache.spark.sql.DataFrame = {
      require(n <= 1023, "hotCorpus must stay within one 10-bit block")
      val base = 0x15A4E35L
      (1 to n)
        .map(i => base | (i.toLong << 30))
        .toDF("fp").withColumn("doc_id", col("fp"))
        .select("doc_id", "fp")
    }
    // below break-even: C/D = 10(n-1)/2 ~ BE/2 -> the saturation
    // COUNTER fires (n > SaturatedBucket = 100 in all 10 shared-triple
    // buckets) but the candidate surplus does not pay for widening (a
    // band-explode row costs ~40 candidate rows — see
    // WideBreakEvenCandPerFp's provenance). Saturation observability
    // and the width decision are different thresholds by design.
    val nBelow = math.max(151, (BE / 10).toInt + 1) // C/D ~ BE/2
    val below = hotCorpus(nBelow)
    assert(MultimodalOps.saturatedMediaBuckets(below).count() == 10L)
    assert(!MultimodalOps.wideBandingNeeded(below),
      "below break-even the narrow candidate surplus does not pay for widening")
    // just past break-even: C/D = 10(n-1)/2 > BE -> wide armed
    val nPast = (2 * BE / 10).toInt + 2
    val past = hotCorpus(nPast)
    assert(MultimodalOps.wideBandingNeeded(past),
      "a saturating corpus must arm the wide banding automatically")
    // the conf knob flips BOTH decisions on the SAME fixtures
    // (r16 verdict item 4: the measured default is this machine's
    // shuffle-cost ratio; a cluster overrides it)
    try {
      spark.conf.set("spark.graft.bandBreakEven", (20 * BE).toString)
      assert(!MultimodalOps.wideBandingNeeded(past),
        "a raised break-even must keep the saturating corpus narrow")
      spark.conf.set("spark.graft.bandBreakEven", (BE / 20).toString)
      assert(MultimodalOps.wideBandingNeeded(below),
        "a lowered break-even must arm wide on the below-default corpus")
    } finally spark.conf.unset("spark.graft.bandBreakEven")
    assert(!MultimodalOps.wideBandingNeeded(below),
      "unsetting the conf must restore the measured default")
    // exactness is banding-independent on the below corpus (the
    // saturating corpus is pair-equal too, but its wide side explodes
    // 10 shared-block hot buckets — the adversarial pigeonhole spec
    // above owns exactness; this pins the small corpus cheaply)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val auto = pairSet(MultimodalOps.fpPairsAuto(below))
    assert(auto == pairSet(MultimodalOps.fpPairs(below, wide = true)))
    assert(auto == pairSet(MultimodalOps.fpPairs(below)))
  }
}
