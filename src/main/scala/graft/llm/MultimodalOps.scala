package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Multimodal-column plumbing (SURVEY.md §0 scope addendum): images /
  * audio / video as opaque `binary` columns with typed metadata, plus the
  * decode-free header-extract / feature / resize / frame-sample stages of
  * a training pipeline.
  *
  * Payloads are REAL container bytes: each document's UTF-8 text rides
  * as the body of a spec-conformant PNG / JPEG(JFIF) / RIFF-WAVE /
  * ISO-BMFF(MP4) container whose header fields (dimensions, sample rate,
  * timescale…) are doc_id-derived — so the extraction kernel
  * ([[MediaHeaders]]) does real byte-level format parsing (magic sniff,
  * JPEG segment walk, MP4 box walk, both endiannesses), and because
  * header synthesis is deterministic arithmetic, the extraction output
  * is DuckDB-oracle-checkable end-to-end (q51): a parser bug breaks the
  * hash compare. No codec ships in this environment, so pixel/PCM
  * DECODING specifically stays out of scope — headers carry the
  * metadata a curation pipeline actually filters on.
  *
  * Scale notes: payloads never enter a shuffle key; the only wide ops key
  * on doc_id/format. Feature extraction is a narrow mapPartitions that
  * processes fixed-size batches (the JVM analogue of Arrow-batched Pandas
  * UDFs), so executor memory is bounded by batch × payload size.
  */
object MultimodalOps {

  private val formats = array(lit("jpeg"), lit("png"), lit("wav"), lit("mp4"))

  // ---- binary header synthesis (codegen'd native fns only) ---------------
  private def hx(s: String): Column = unhex(lit(s))
  private def u8(c: Column): Column =
    unhex(lpad(hex(c.bitwiseAND(lit(255L))), 2, "0"))
  private def be16(c: Column): Column = unhex(lpad(hex(c), 4, "0"))
  private def be32(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
  private def le16(c: Column): Column = concat(u8(c), u8(shiftright(c, 8)))
  private def le32(c: Column): Column =
    concat(u8(c), u8(shiftright(c, 8)), u8(shiftright(c, 16)), u8(shiftright(c, 24)))

  /** PNG: signature + IHDR(width, height, bitdepth 8, truecolor). The
    * IHDR CRC rides as zeros — header sniffers don't checksum. 33-byte
    * header. */
  private def pngHeader(w: Column, h: Column): Column =
    concat(hx("89504E470D0A1A0A" + "0000000D" + "49484452"),
      be32(w), be32(h), hx("080200000000000000"))

  /** JPEG/JFIF: SOI + APP0(JFIF 1.1) + SOF0(precision 8, h, w, 3
    * components) — the segment a dimension probe must WALK to, exactly
    * as in a camera file. 39-byte header. */
  private def jpegHeader(w: Column, h: Column): Column =
    concat(hx("FFD8" + "FFE0" + "0010" + "4A46494600" + "0101" + "00" +
        "0001" + "0001" + "0000" + "FFC0" + "0011" + "08"),
      be16(h), be16(w), hx("03" + "012200" + "021101" + "031101"))

  /** RIFF/WAVE: canonical 44-byte header (PCM fmt chunk + data chunk
    * sized to the body) — little-endian throughout, per RIFF. */
  private def wavHeader(ch: Column, rate: Column, body: Column): Column =
    concat(hx("52494646"), le32(body + 36), hx("57415645" + "666D7420" +
        "10000000" + "0100"),
      le16(ch), le32(rate), le32(rate * ch * 2), le16(ch * 2), le16(lit(16)),
      hx("64617461"), le32(body))

  /** ISO-BMFF: ftyp(isom) + moov[mvhd v0 (timescale, duration, unity
    * matrix)] + an mdat box sized to carry the body — the body MUST ride
    * inside a box or a conformant box walker rejects the file. 144 bytes
    * of header before the mdat payload. */
  private def mp4Header(timescale: Column, duration: Column, body: Column): Column =
    concat(hx("00000014" + "66747970" + "69736F6D" + "00000200" + "69736F6D"),
      hx("00000074" + "6D6F6F76" + "0000006C" + "6D766864" + "00000000" +
        "00000000" + "00000000"),
      be32(timescale), be32(duration),
      hx("00010000" + "0100" + "00000000000000000000" +
        "000100000000000000000000000000000001000000000000000000000000000040000000" +
        "000000000000000000000000000000000000000000000000" + "00000002"),
      be32(body + 8), hx("6D646174"))

  /** Synthesize the media table: binary payload with a REAL container
    * header + typed metadata. Every header field is doc_id arithmetic
    * (oracle-expressible); the document text is the container body. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    mediaTableOf(t(s, dir, "documents"))

  /** [[mediaTable]] over an explicit documents frame — the seam that
    * lets per-byte passes (q182's hash) take the SPREAD read
    * ([[graft.Tables.tSpread]]): a small fixture parquet is one split,
    * and a single-split scan serializes the whole kernel pass onto one
    * core (measured 2.9 s → 0.9 s at sf0.1). */
  private def mediaTableOf(docs: DataFrame): DataFrame = {
    val w = (pmod(col("doc_id") * 37, lit(1024)) + 256).cast("int")
    val h = (pmod(col("doc_id") * 53, lit(768)) + 144).cast("int")
    val ch = (col("doc_id") % 2 + 1).cast("int")
    val rate = (lit(8000) * (col("doc_id") % 5 + 1)).cast("int")
    val dur = (lit(1500) * (col("doc_id") % 5 + 2)).cast("int")
    docs
      // No text, no asset: a NULL body would null-propagate through
      // concat into a NULL payload, which is not a media row — every
      // downstream consumer (parser, feature batch, byte accounting)
      // correctly assumes payload is a real byte array.
      .filter(col("text").isNotNull)
      .select(
        col("doc_id"),
        element_at(formats, (col("doc_id") % 4 + 1).cast("int")).as("format"),
        encode(col("text"), "UTF-8").as("body"),
        w.as("w"), h.as("h"), ch.as("ch"), rate.as("rate"), dur.as("dur"))
      .withColumn("payload", concat(
        when(col("format") === "png", pngHeader(col("w"), col("h")))
          .when(col("format") === "jpeg", jpegHeader(col("w"), col("h")))
          .when(col("format") === "wav",
            wavHeader(col("ch"), col("rate"), length(col("body"))))
          .otherwise(
            mp4Header(lit(600), col("dur"), length(col("body")))),
        col("body")))
      .select(col("doc_id"), col("format"), col("payload"),
        struct(
          length(col("payload")).as("n_bytes"),
          col("w").as("width"),
          col("h").as("height"))
          .as("meta"))
  }

  /** Media catalog: per-format byte volumes — the profiling pass before a
    * decode job. */
  def mediaCatalog(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .groupBy("format")
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("meta.n_bytes").cast("long")).as("total_bytes"),
        max(col("meta.n_bytes")).as("max_bytes"))
      .orderBy("format")

  case class MediaRow(doc_id: Long, format: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Int,
    features: Array[Float])

  /** Feature extraction over binary payloads in fixed-size batches.
    *
    * ===== STUB decode kernel =====
    * A real pipeline would decode image/audio bytes here (e.g. JNI codec
    * or model inference). This stub derives 8 deterministic floats from
    * payload bytes so the surrounding plumbing (batching, schema,
    * partition preservation) is fully testable.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real kernel would run vectorized decode
        batch.map { r =>
          val feats = Array.tabulate(8) { i =>
            if (r.payload.isEmpty) 0.0f
            else {
              val slice = r.payload.iterator.zipWithIndex
                .filter(_._2 % 8 == i).map(_._1.toInt & 0xff).sum
              (slice % 1000) / 1000.0f
            }
          }
          MediaFeatures(r.doc_id, r.format, r.payload.length, feats)
        }
      }
    }
  }

  /** Typed view of the media table for the feature path. */
  def mediaDataset(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    mediaTable(s, dir).select("doc_id", "format", "payload").as[MediaRow]
  }

  /** q51: real decode-free metadata extraction. [[MediaHeaders.parse]]
    * walks each payload's container bytes (magic sniff, JPEG segment
    * walk, MP4 box walk) in the same batched mapPartitions shape a
    * vectorized inference kernel would use. Because every header field
    * is doc_id arithmetic, the parsed output is fully DuckDB-oracle
    * checked — a parser or synthesis bug breaks the hash compare. */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaDataset(s, dir).mapPartitions { rows =>
      rows.grouped(64).flatMap(_.map { r =>
        val p = MediaHeaders.parse(r.payload)
        (r.doc_id, r.format, if (p.ok) 1 else 0, p.dim1, p.dim2, p.depth,
          r.payload.length)
      })
    }.toDF("doc_id", "format", "ok", "dim1", "dim2", "depth", "n_bytes")
      .orderBy("doc_id")
  }

  /** Frame sampling plan for video assets: one row per sampled frame with
    * its timestamp offset — `explode(sequence(...))`, the scalable
    * row-expansion primitive (no driver loop). */
  def frameSamplePlan(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .filter(col("format") === "mp4")
      .select(col("doc_id"),
        (col("doc_id") % 5 + 2).cast("int").as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        round(col("frame_idx") * 2.5, 1).as("ts_offset_sec"))
      .orderBy("doc_id", "frame_idx")

  /** Resize plan: scale metadata dims to fit 224×224 preserving aspect
    * ratio — integer/double column math only. */
  def resizePlan(s: SparkSession, dir: String): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    // long side lands exactly on the 224 target (floor(x*224/x) would
    // drift to 223 through floating point); short side scales down
    mediaTable(s, dir)
      .filter(col("format").isin("jpeg", "png"))
      .select(
        col("doc_id"),
        w.as("width"),
        h.as("height"),
        when(w >= h, 224).otherwise(floor(w * 224.0 / h).cast("int")).as("out_width"),
        when(h >= w, 224).otherwise(floor(h * 224.0 / w).cast("int")).as("out_height"))
      .orderBy("doc_id")
  }

  /** (doc_id, fp) over an explicit documents frame — container
    * synthesis + the codegen'd gram-SimHash, malformed/too-short
    * sentinels dropped. The shared fingerprint pass of q182 (full
    * corpus), the staged [[MediaFpIndex]] build (base side), and the
    * per-batch work of q186 / the streaming fingerprint maintainer. */
  private[graft] def mediaFps(docs: DataFrame): DataFrame = {
    import graft.functions.MediaHashKernel.media_phash
    mediaTableOf(docs)
      .select(col("doc_id"), media_phash(col("payload")).as("fp"))
      .filter(col("fp") =!= -1L)
  }

  /** Combinatorial band keys for exact Hamming ≤ 3 retrieval over a
    * 60-bit fingerprint: six 10-bit blocks, one fused (bno, bval) long
    * key per C(6,3)=20 block triple (see
    * [[graft.functions.BandKeyKernel]] — a fused Catalyst kernel since
    * r17 so BOTH widths stay inside whole-stage codegen; the wide
    * width's 120 inline subset expressions used to blow janino's 64 KB
    * method limit and run interpreted). Two fingerprints within
    * Hamming 3 share ≥ 3 intact blocks and therefore ≥ 1 full key
    * (pigeonhole; see the q182 scaladoc). Shared by the batch query
    * and the streaming fingerprint maintainer so the two sides can
    * never band differently. */
  /** The exact-retrieval Hamming bound of the fingerprint pair tail —
    * pigeonhole-tied to the 3-of-6-block banding (≤ 3 flipped bits
    * leave ≥ 3 intact blocks). Shared by the Spark verify filter and
    * the DuckDB oracles so the threshold can never drift one-sided. */
  private[graft] val HammingMax = 3

  private[graft] val HammingBandCount: Int =
    graft.functions.BandKeyKernel.NarrowBands // 20

  private[graft] def hammingBandKeys(fp: Column): Column =
    graft.functions.BandKeyKernel.band_keys(fp, wide = false)

  /** Decode the fused key back to its (band index, band value) halves —
    * observability only (the join and the histogram key on the fused
    * long itself). */
  private[graft] def bandNo(key: Column): Column =
    shiftright(key, graft.functions.BandKeyKernel.BvalBits).cast("int")
  private[graft] def bandVal(key: Column): Column =
    key.bitwiseAND(lit((1L << graft.functions.BandKeyKernel.BvalBits) - 1))

  /** The WIDE banding — the PartEnum dial turned one notch: ten 6-bit
    * blocks, one 42-bit key per C(10,7)=120 block 7-subsets.
    * Pigeonhole exactness at Hamming ≤ [[HammingMax]] is preserved
    * (≤ 3 flipped bits touch ≤ 3 blocks, leaving ≥ 7 intact, and every
    * 7-subset of intact blocks is one of the keys), bucket space grows
    * 2^30 → 2^42 for 6× the explode rows. This is the named mitigation
    * when [[saturatedMediaBuckets]] fires — measured on the audio
    * kernel, whose energy-sign bits CORRELATE on homogeneous corpora
    * (ScaleSoak `audio_neardup`: 3587 saturated narrow buckets at 500k
    * synthetic docs; `audio_neardup_wide` re-measures with this
    * banding). Selected by the ENGINE at plan time — every production
    * pairing path goes through [[fpPairsAuto]]/[[fpNeighborReportAuto]],
    * which run the [[wideBandingNeeded]] band-stat pre-pass and pick
    * the width; [[fpPairs]]'s explicit `wide` flag remains for specs
    * and the soak's A/B measurement. A plan choice, not an index
    * rebuild (fingerprints are banding-agnostic state). */
  private[graft] def hammingBandKeysWide(fp: Column): Column =
    graft.functions.BandKeyKernel.band_keys(fp, wide = true)

  /** q182: perceptual near-dup over media payloads — the multimodal
    * member of the dedup family (text has MinHash/SimHash/substring,
    * embeddings have LSH/SemDeDup; this covers the media payload bytes
    * themselves). Pipeline shape is the perceptual-hash classic:
    * locate each container's signal bytes (real byte walk,
    * [[MediaHeaders.bodyOffset]]), fingerprint them with the codegen'd
    * 60-bit gram-SimHash kernel ([[graft.functions.MediaHashKernel]]), band
    * the fingerprint into four 15-bit quarters, pair within buckets,
    * verify by exact Hamming distance ≤ 3. By pigeonhole (4 bands,
    * ≤ 3 differing bits) banding is EXACT retrieval, so the DuckDB
    * brute-force oracle matches pair-for-pair.
    *
    * 100 TB posture: identical payloads collapse to one fingerprint
    * BEFORE banding (the exact-dup-collapse-before-banding rule — a
    * crawl's million-clone asset costs one banded row, not a 10^12-pair
    * bucket); only DISTINCT fingerprints ride the band shuffle (8-byte
    * keys, never payload bytes); within-group and cross-group pairs are
    * reconstructed by id joins, so every stage is candidate- or
    * output-sized, never all-pairs.
    *
    * Banding is COMBINATORIAL 3-of-6-block keys (the round-11 verdict's
    * scale ceiling, fixed round 12): the naive 4×15-bit quarters give
    * pigeonhole exactness at Hamming ≤ 3 but a FIXED 2^15 bucket space
    * per band, so expected candidate pairs grow ~N²/2^15 — catastrophic
    * past ~10^8 distinct fingerprints. Instead split the 60 bits into
    * six 10-bit blocks and key each fingerprint under every C(6,3)=20
    * concatenation of three blocks (30-bit keys → 2^30 bucket space).
    * Pigeonhole still holds: ≤ 3 flipped bits touch ≤ 3 blocks, leaving
    * ≥ 3 blocks intact, and every 3-subset of intact blocks is one of
    * the 20 keys — so two fingerprints within Hamming 3 ALWAYS collide
    * on at least one key (spec'd adversarially in MultimodalSpec), and
    * the exact-Hamming verify after the bucket join discards the rest.
    * 5× the explode rows for 2^15× the bucket space: expected pairs at
    * N=5M distinct fps drop from ~4·N²/2^15 ≈ 3·10^9 to ~20·N²/2^30 ≈
    * 5·10^5 (ScaleSoak `media` op measures the curve). This is the
    * signature scheme of PartEnum (Arasu, Ganti & Kaushik, VLDB 2006)
    * / Greene-Parnas-Yao pigeonhole search, chosen over multi-index
    * Hamming probing because it stays one shuffle-join, no probe loop. */
  def mediaPerceptualNearDup(s: SparkSession, dir: String): DataFrame = {
    // Four plan references in the pair tail (distinct, both expansion
    // sides, the same-fp self-join) — without pinning, Catalyst re-runs
    // container synthesis + the md5-per-window kernel per reference
    // (~5× the corpus hash work, measured 8 s → 1 s at sf0.1). The
    // pinned frame is (id, long) — bytes never survive past this line.
    val fps = graft.Materialize.stable(
      mediaFps(graft.Tables.tSpread(s, dir, "documents")))
    fpPairsAuto(fps)
  }

  /** The AUDIO corpus stand-in: EVERY document's bytes wrapped as a
    * RIFF/WAVE asset (no codec ships in this environment — the data
    * chunk is the document body, the doc-id-derived header fields make
    * the kernel's header-exclusion walk load-bearing). Full-corpus
    * rather than [[mediaTable]]'s wav quarter so the planted clone
    * pairs land in scope and the q196 oracle is non-vacuous. */
  private def audioTableOf(docs: DataFrame): DataFrame = {
    val ch = (col("doc_id") % 2 + 1).cast("int")
    val rate = (lit(8000) * (col("doc_id") % 5 + 1)).cast("int")
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("body"),
        ch.as("ch"), rate.as("rate"))
      .select(col("doc_id"),
        concat(wavHeader(col("ch"), col("rate"), length(col("body"))),
          col("body")).as("payload"))
  }

  /** (doc_id, fp) AUDIO fingerprints of an explicit documents frame —
    * the energy-profile kernel
    * ([[graft.functions.MediaHashKernel.audioPhash]]) over each wav
    * asset's PCM samples, sentinels dropped. The audio sibling of
    * [[mediaFps]]; same (id, long) shape, so it rides the SAME banded
    * pair tail and could stage/stream through the same maintainer
    * shape byte-for-byte. */
  private[graft] def audioFps(docs: DataFrame): DataFrame = {
    import graft.functions.MediaHashKernel.audio_phash
    audioTableOf(docs)
      .select(col("doc_id"), audio_phash(col("payload")).as("fp"))
      .filter(col("fp") =!= -1L)
  }

  /** q196: perceptual near-dup over AUDIO payloads (VERDICT r14
    * item 7) — q182's cascade with the sample-domain kernel: WAV data
    * chunks are read as signed LE16 PCM, fingerprinted by the 61-window
    * energy-difference sign profile (Haitsma & Kalker 2002's shape —
    * invariant under uniform gain, the transform re-encoded/normalized
    * audio clones actually undergo, where the byte-gram hash of q182
    * flips every vote; MultimodalSpec pins the invariance on a 4×-gain
    * clone), then the SAME combinatorial 3-of-6-block banding +
    * exact-Hamming ≤ 3 verify tail ([[fpPairs]]) — pigeonhole exactness
    * is a property of the 60-bit fingerprint width, not of what the
    * bits mean, so the tail is shared verbatim.
    *
    * Output is one row per asset: fingerprint + its exact ≤ 3-Hamming
    * neighbor count, NOT the bare pair listing — the fixture's planted
    * clones are tail-INSERTIONS (q182's gram hash catches those; an
    * insertion rescales this kernel's time windows by design), so the
    * pair set alone would be an empty, vacuous oracle. The per-asset
    * fingerprint column pins the kernel bit-for-bit against DuckDB's
    * recomputation on every asset, clones or not, and the neighbor
    * count pins the cascade through the same SQL. Same 100 TB posture
    * as q182: identical fingerprints collapse before banding, only
    * (id, long) rows ride any shuffle. */
  def audioPerceptualNearDup(s: SparkSession, dir: String): DataFrame =
    fpNeighborReportAuto(graft.Materialize.stable(
      audioFps(graft.Tables.tSpread(s, dir, "documents"))))

  /** The per-asset fingerprint + exact ≤ 3-Hamming neighbor count over
    * a pinned (doc_id, fp) frame — q196's output tail, shared by the
    * staged q197 and the streaming audio maintainer's probe so the
    * three forms can never drift. */
  private[graft] def fpNeighborReport(fps: DataFrame,
      wide: Boolean = false): DataFrame = {
    val pairs = fpPairs(fps, wide)
    val cnt = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    fps.join(cnt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("fp"),
        coalesce(col("n"), lit(0L)).as("n_neighbors"))
      .orderBy("doc_id")
  }

  /** q197 — audio fingerprint-index maintenance: q196's report over
    * the staged base audio fingerprints ([[MediaFpIndex.audioFps]], the
    * per-payload kernel paid once per corpus version) PLUS an
    * un-indexed ingest batch fingerprinted in-plan — the q186 pattern
    * applied to the audio kind. Shares q196's oracle BY DESIGN (the
    * q132/q170/q186 add-batch contract): staged base ∪ hashed batch
    * must report exactly like the fresh full-corpus run. */
  def audioFpAddBatch(s: SparkSession, dir: String): DataFrame = {
    val base = MediaFpIndex.audioFps(s, dir)
    val batch = audioFps(graft.Tables.tSpread(s, dir, "documents")
      .filter(NearDupOps.isNewDoc(col("doc_id"))))
    fpNeighborReportAuto(graft.Materialize.stable(base.unionByName(batch)))
  }

  /** q186 — fingerprint-index maintenance: the q182 pair set over the
    * staged base fingerprints ([[MediaFpIndex]], the expensive byte-walk
    * hash paid once per corpus version) PLUS an un-indexed ingest batch
    * hashed in-plan — the q132 pattern applied to the media family. Per
    * query only the BATCH's payloads are parsed and hashed (O(batch));
    * the merged (doc_id, fp) frame rides the shared [[fpPairs]] tail.
    * Integrity contract: the merged state must pair EXACTLY like a
    * fresh full-corpus run — the oracle is q182's brute-force SQL, so a
    * fingerprint lost or duplicated by the merge is a hash mismatch. */
  def mediaFpAddBatch(s: SparkSession, dir: String): DataFrame = {
    val base = MediaFpIndex.fps(s, dir)
    val batch = mediaFps(graft.Tables.tSpread(s, dir, "documents")
      .filter(NearDupOps.isNewDoc(col("doc_id"))))
    fpPairsAuto(graft.Materialize.stable(base.unionByName(batch)))
  }

  /** Observability for the banding candidate budget on the shared
    * [[fpPairs]] tail (the media port of [[NearDupOps.saturatedBands]],
    * r12 verdict item 2): buckets holding more than [[SaturatedBucket]]
    * DISTINCT fingerprints. Unlike the text-LSH family there is no
    * hub-star guard here — the bucket join is COMPLETE (that is what
    * makes retrieval exact), so a hot bucket of n fingerprints costs
    * ~n²/2 candidate rows before the Hamming verify; this view makes
    * that budget loud instead of silent. Non-zero is not an error —
    * pairing stays exact — it is the signal to widen the band keys
    * (4-of-8 blocks buys 2^10× more bucket space at Hamming ≤ 3... the
    * PartEnum dial) before the quadratic term lands. Asserted empty on
    * the shipped fixtures and fired on a synthetic hot-bucket corpus in
    * MultimodalSpec; the media ScaleSoak prints it per decade. */
  private[graft] val SaturatedBucket = 100L

  def saturatedMediaBuckets(fps: DataFrame): DataFrame =
    fps.select("fp").distinct()
      .select(explode(hammingBandKeys(col("fp"))).as("bk"))
      .groupBy("bk")
      .agg(count(lit(1)).as("n_fps"))
      .filter(col("n_fps") > SaturatedBucket)
      .select(bandNo(col("bk")).as("bno"), bandVal(col("bk")).as("bval"),
        col("n_fps"))
      .orderBy("bno", "bval")

  /** Wide banding's extra explode rows per distinct fingerprint:
    * C(10,7) − C(6,3) = 120 − 20 = 100 more band keys. */
  private[graft] val WideKeySurcharge: Long =
    (0 until 10).combinations(7).size.toLong - HammingBandCount

  /** The MEASURED break-even of [[wideBandingNeeded]], in narrow
    * candidate pairs per distinct fingerprint. The naive model —
    * candidates and band rows cost the same, so widen when
    * C > [[WideKeySurcharge]]·D — mispredicts badly: a band-explode
    * row (shuffled, sorted, hash-joined) costs ~40× a candidate row
    * (join OUTPUT filtered in place, never shuffled).
    *
    * Provenance (r17 re-fit, `docs/soak_r17_scale.log` — the r16 fit
    * of 1500 was measured with the wide arm running INTERPRETED past
    * janino's 64 KB limit; with both arms codegen'd through the fused
    * [[graft.functions.BandKeyKernel]] the audio two-width decades
    * measure narrow/wide 17.6 / 45.2 s at 500k docs, 50.8 / 138.7 s at
    * 2M, 291.2 / 558.9 s at 5M — narrow still 1.9× faster at
    * C/D = 1783, directly refuting 1500): the two clean decades solve
    * to a ≈ 0.64 µs/band-row, b ≈ 0.016 µs/candidate — the codegen fix
    * cut the band row ~4.5× but the fused single-long bucket key cut
    * the candidate ~12×, so the break-even RISES —
    * C/D = WideKeySurcharge · a/b ≈ 4100, shipped as 4000. The 5M
    * point's residual (wide under-predicted by ~110 s: at 86k
    * saturated narrow buckets the wide arm's own candidate term stops
    * being negligible) says the true crossover sits above the fit, so
    * 4000 errs on the cheap side of the asymmetry — arming early pays
    * at most the ~2× wide constant, arming late pays the quadratic
    * candidate term.
    *
    * This is the DEFAULT: the fit bakes in THIS machine's
    * shuffle-vs-join-output cost ratio, and a real cluster's ratio
    * differs, so deployments override it with
    * `spark.graft.bandBreakEven` (r16 verdict item 4). */
  private[graft] val WideBreakEvenCandPerFp: Long = 4000L

  /** The conf knob for the break-even, measured default unchanged. */
  private[graft] def bandBreakEven(s: SparkSession): Long =
    s.conf.getOption("spark.graft.bandBreakEven").map(_.toLong)
      .getOrElse(WideBreakEvenCandPerFp)

  /** The decision rule, one place for the query path, the streaming
    * probes, and the soak's per-decade printout. */
  private[graft] def wideWorthIt(narrowCandidates: Long, nFp: Long,
      breakEven: Long = WideBreakEvenCandPerFp): Boolean =
    narrowCandidates > breakEven * nFp

  /** The PLAN-TIME banding decision (round-15 verdict item 1 — the
    * `wide` flag was a compile-time call-site dial; a correlated
    * fingerprint corpus saturates narrow 3-of-6 banding — the round-15
    * audio soak measured 3,587 hot buckets at 500k docs — and candidate
    * generation goes quadratic until a human flips it). This pre-pass
    * is the [[saturatedMediaBuckets]] aggregation taken one step
    * further: build the narrow bucket histogram over DISTINCT
    * fingerprints (8-byte keys only, reuses the caller's pin) and
    * compare the exact narrow candidate count Σ n·(n−1)/2 against the
    * MEASURED break-even [[WideBreakEvenCandPerFp]] · D (provenance at
    * the constant: both widths timed on the same 500k / 2M correlated
    * corpora). One tiny driver-side Row — a stats probe in the AQE
    * spirit, not a collect loop. Pigeonhole exactness holds for both
    * bandings, so the choice can never change the answer — spec-pinned
    * report-identical in MultimodalSpec. */
  /** The decision's inputs, exposed for observability (the ScaleSoak
    * decades print them next to the narrow/wide wall times):
    * (narrow candidate pairs Σ n·(n−1)/2, distinct fingerprints). */
  private[graft] def narrowBandStats(fps: DataFrame): (Long, Long) = {
    val row = fps.select("fp").distinct()
      .select(explode(hammingBandKeys(col("fp"))).as("bk"))
      .groupBy("bk")
      .agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n") * (col("n") - 1)), lit(0L)).as("cand2"),
        coalesce(sum(col("n")), lit(0L)).as("band_rows"))
      .head()
    (row.getLong(0) / 2, row.getLong(1) / HammingBandCount)
  }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private[graft] def wideBandingNeeded(fps: DataFrame): Boolean = {
    val (narrowCandidates, nDistinctFp) = narrowBandStats(fps)
    val breakEven = bandBreakEven(fps.sparkSession)
    val wide = wideWorthIt(narrowCandidates, nDistinctFp, breakEven)
    // the soak prints the decision per decade; production queries log
    // it too (r16 verdict item 4: the inputs must be observable on the
    // query path, not only under the soak harness)
    log.info(s"banding decision: narrow_cand=$narrowCandidates " +
      s"n_fp=$nDistinctFp break_even=$breakEven " +
      s"chose=${if (wide) "wide" else "narrow"}")
    wide
  }

  /** [[fpPairs]] with the banding width chosen by the engine
    * ([[wideBandingNeeded]]) instead of the call site — the production
    * entry for every fingerprint pairing path (q182/q186 and the
    * streaming media maintainer). Requires a pinned frame, same as
    * [[fpPairs]] (the stats pre-pass is one extra scan of the pin). */
  private[graft] def fpPairsAuto(fps: DataFrame): DataFrame =
    fpPairs(fps, wide = wideBandingNeeded(fps))

  /** [[fpNeighborReport]] with engine-chosen banding width — the
    * production entry for the audio report paths (q196/q197 and the
    * streaming audio maintainer). */
  private[graft] def fpNeighborReportAuto(fps: DataFrame): DataFrame =
    fpNeighborReport(fps, wide = wideBandingNeeded(fps))

  /** The collapse-then-band pair tail over a PINNED (doc_id, fp) frame:
    * band distinct fingerprints, bucket-join, exact-Hamming verify,
    * expand members by id joins. Shared by q182 (full corpus), q186
    * (staged base ∪ ingest batch), and the streaming fingerprint
    * maintainer — one tail, so the three paths cannot band or verify
    * differently. Callers must pass a materialized frame (each side of
    * the expansion re-references it). */
  private[graft] def fpPairs(fps: DataFrame,
      wide: Boolean = false): DataFrame = {
    val distinctFp = fps.select("fp").distinct()
    val keys = if (wide) hammingBandKeysWide(col("fp"))
      else hammingBandKeys(col("fp"))
    // the fused (bno << 42 | bval) long is the whole bucket identity —
    // the join keys on ONE 8-byte column
    val bands = distinctFp.select(col("fp"), explode(keys).as("bk"))
    val closeFp = bands.as("a")
      .join(bands.as("b"), col("a.bk") === col("b.bk") &&
        col("a.fp") < col("b.fp"))
      .select(col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .dropDuplicates("fp_a", "fp_b")
      .withColumn("hamming",
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
      .filter(col("hamming") <= HammingMax)
    // member expansion: cross-group pairs via id joins; identical-
    // fingerprint members pair at distance 0 (the collapsed groups)
    val cross = closeFp
      .join(fps.select(col("doc_id").as("id_a"), col("fp").as("fp_a")), Seq("fp_a"))
      .join(fps.select(col("doc_id").as("id_b"), col("fp").as("fp_b")), Seq("fp_b"))
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"), col("hamming"))
    val same = fps.as("x")
      .join(fps.as("y"), col("x.fp") === col("y.fp") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        lit(0L).as("hamming"))
    cross.unionByName(same).orderBy("doc_a", "doc_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_media_catalog" -> mediaCatalog,
    "q51_media_features" -> mediaFeatures,
    "q52_frame_sample"  -> frameSamplePlan,
    "q53_resize_plan"   -> resizePlan,
    "q182_media_neardup" -> mediaPerceptualNearDup,
    "q186_media_fp_add_batch" -> mediaFpAddBatch,
    "q196_audio_neardup" -> audioPerceptualNearDup,
    "q197_audio_fp_add_batch" -> audioFpAddBatch)

  // payload length = UTF-8 body + the per-format container header
  // (png 33 B, jpeg 39 B, wav 44 B, mp4 144 B — see the synth fns above)
  val oracleSql: Map[String, String] = Map(
    "q50_media_catalog" ->
      """SELECT format, COUNT(*) AS n_assets,
        |  CAST(SUM(octet_length(encode(text)) + hdr) AS BIGINT) AS total_bytes,
        |  CAST(MAX(octet_length(encode(text)) + hdr) AS INTEGER) AS max_bytes
        |FROM (SELECT ['jpeg','png','wav','mp4'][CAST(doc_id % 4 + 1 AS INTEGER)] AS format,
        |             CASE doc_id % 4 WHEN 0 THEN 39 WHEN 1 THEN 33 WHEN 2 THEN 44 ELSE 144 END AS hdr,
        |             text
        |      FROM documents WHERE text IS NOT NULL)
        |GROUP BY format ORDER BY format""".stripMargin,
    "q51_media_features" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    ['jpeg','png','wav','mp4'][CAST(doc_id % 4 + 1 AS INTEGER)] AS format,
        |    octet_length(encode(text)) AS body_len
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, format, 1 AS ok,
        |  CAST(CASE format
        |    WHEN 'wav' THEN 8000 * (doc_id % 5 + 1)
        |    WHEN 'mp4' THEN 600
        |    ELSE (doc_id * 37) % 1024 + 256 END AS INTEGER) AS dim1,
        |  CAST(CASE format
        |    WHEN 'wav' THEN doc_id % 2 + 1
        |    WHEN 'mp4' THEN 1500 * (doc_id % 5 + 2)
        |    ELSE (doc_id * 53) % 768 + 144 END AS INTEGER) AS dim2,
        |  CAST(CASE format WHEN 'wav' THEN 16 WHEN 'mp4' THEN 0 ELSE 8 END AS INTEGER) AS depth,
        |  CAST(body_len + CASE format WHEN 'png' THEN 33 WHEN 'jpeg' THEN 39
        |                              WHEN 'wav' THEN 44 ELSE 144 END AS INTEGER) AS n_bytes
        |FROM m ORDER BY doc_id""".stripMargin,
    "q52_frame_sample" ->
      """SELECT doc_id, CAST(unnest(generate_series(0, n_frames - 1)) AS INTEGER) AS frame_idx,
        |  ROUND(CAST(unnest(generate_series(0, n_frames - 1)) AS INTEGER) * 2.5, 1) AS ts_offset_sec
        |FROM (SELECT doc_id, CAST(doc_id % 5 + 2 AS INTEGER) AS n_frames
        |      FROM documents
        |      WHERE ['jpeg','png','wav','mp4'][CAST(doc_id % 4 + 1 AS INTEGER)] = 'mp4'
        |        AND text IS NOT NULL)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q53_resize_plan" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    ['jpeg','png','wav','mp4'][CAST(doc_id % 4 + 1 AS INTEGER)] AS format,
        |    CAST((doc_id * 37) % 1024 + 256 AS INTEGER) AS width,
        |    CAST((doc_id * 53) % 768 + 144 AS INTEGER) AS height
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, width, height,
        |  CASE WHEN width >= height THEN 224
        |       ELSE CAST(FLOOR(width * 224.0 / height) AS INTEGER) END AS out_width,
        |  CASE WHEN height >= width THEN 224
        |       ELSE CAST(FLOOR(height * 224.0 / width) AS INTEGER) END AS out_height
        |FROM m WHERE format IN ('jpeg', 'png')
        |ORDER BY doc_id""".stripMargin,
    // Brute-force twin of the banded Spark plan: recompute the 60-bit
    // gram-SimHash from the same body bytes — gram w is the uppercase
    // hex of bytes w..w+7 (`substr(hex(body), 2w+1, 16)`), its 60-bit
    // key the leading 15 hex chars of md5(gram) (bit i lives in hex
    // char 15 - i//4 at nibble bit i%4 — the q45 mapping shifted one
    // nibble), per-bit ±1 votes, positive vote ⇒ bit set — then
    // ALL-PAIRS Hamming ≤ 3. Banding is pigeonhole-exact, so the sets
    // must match pair-for-pair. q186 shares the SQL BY DESIGN (the
    // q132/q170 add-batch contract): staged base ∪ hashed batch must
    // reproduce the full-corpus pair set bit-for-bit.
    "q186_media_fp_add_batch" -> mediaNearDupOracle,
    "q182_media_neardup" -> mediaNearDupOracle,
    // Brute-force twin of the banded audio plan (q196): every doc's
    // body bytes as signed LE16 PCM samples decoded from hex(body)
    // nibble arithmetic, 61 windows by w = j*61 // n,
    // per-window energy as exact BIGINT Σ s², bit i set iff
    // e(i+1) > e(i), then ALL-PAIRS Hamming ≤ 3 — banding is
    // pigeonhole-exact, so the sets match pair-for-pair. q197 shares
    // the SQL BY DESIGN (the q186 add-batch contract): staged base ∪
    // hashed batch must report exactly like the full-corpus run.
    "q197_audio_fp_add_batch" -> audioNearDupOracle,
    "q196_audio_neardup" -> audioNearDupOracle)

  // Window count / bit count / Hamming bound interpolate from the
  // kernel and pair-tail constants (the SketchK lesson, ADVICE r14):
  // changing MediaHashKernel.Bits or the verify threshold can never
  // silently skew only the oracle.
  private lazy val audioNearDupOracle: String = {
    val bits = graft.functions.MediaHashKernel.Bits
    val win = bits + 1
    s"""WITH m AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |         octet_length(encode(text)) // 2 AS n
       |  FROM documents
       |  WHERE text IS NOT NULL
       |    AND octet_length(encode(text)) // 2 >= $win),
       |samp AS (
       |  SELECT doc_id, n, j.j AS j,
       |      (strpos('0123456789ABCDEF', substr(hx, 4 * j.j + 3, 1)) - 1) * 4096
       |    + (strpos('0123456789ABCDEF', substr(hx, 4 * j.j + 4, 1)) - 1) * 256
       |    + (strpos('0123456789ABCDEF', substr(hx, 4 * j.j + 1, 1)) - 1) * 16
       |    + (strpos('0123456789ABCDEF', substr(hx, 4 * j.j + 2, 1)) - 1) AS v
       |  FROM m, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS j) j),
       |en AS (
       |  SELECT doc_id, CAST((j * $win) // n AS INT) AS w,
       |    SUM(CAST(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS BIGINT)
       |      * (CASE WHEN v >= 32768 THEN v - 65536 ELSE v END)) AS e
       |  FROM samp GROUP BY doc_id, w),
       |fp AS (
       |  SELECT a.doc_id,
       |    CAST(SUM(CASE WHEN b.e > a.e
       |        THEN CAST(1 AS BIGINT) << CAST(a.w AS INT) ELSE 0 END)
       |      AS BIGINT) AS fp
       |  FROM en a JOIN en b ON b.doc_id = a.doc_id AND b.w = a.w + 1
       |  WHERE a.w < $bits
       |  GROUP BY a.doc_id),
       |nb AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_neighbors
       |  FROM (
       |    SELECT a.doc_id FROM fp a JOIN fp b
       |      ON a.doc_id <> b.doc_id
       |     AND bit_count(xor(a.fp, b.fp)) <= $HammingMax
       |  ) GROUP BY doc_id)
       |SELECT f.doc_id, f.fp,
       |  COALESCE(nb.n_neighbors, 0) AS n_neighbors
       |FROM fp f LEFT JOIN nb ON nb.doc_id = f.doc_id
       |ORDER BY f.doc_id""".stripMargin
  }

  private lazy val mediaNearDupOracle: String =
      """WITH m AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS len
        |  FROM documents
        |  WHERE text IS NOT NULL AND octet_length(encode(text)) >= 8),
        |grams AS (
        |  SELECT doc_id, substr(md5(substr(hx, 2 * w + 1, 16)), 1, 15) AS h
        |  FROM m, LATERAL (SELECT unnest(generate_series(0, len - 8)) AS w)),
        |bits AS (
        |  SELECT doc_id, g.i AS i,
        |    SUM(CASE WHEN ((strpos('0123456789abcdef',
        |          substr(h, CAST(15 - (g.i // 4) AS INT), 1)) - 1)
        |        >> (g.i % 4)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM grams, unnest(generate_series(0, 59)) AS g(i)
        |  GROUP BY doc_id, g.i),
        |fp AS (
        |  SELECT doc_id, CAST(SUM(CASE WHEN vote > 0
        |      THEN CAST(1 AS BIGINT) << CAST(i AS INT) ELSE 0 END)
        |    AS BIGINT) AS fp
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= """.stripMargin +
      s"$HammingMax\nORDER BY doc_a, doc_b"
}
