package graft.llm

/** Pure-JVM media container-header parsing — the real decode-free
  * metadata extraction a 100 TB multimodal ingest runs before any codec
  * touches the bytes (reference: the format sniff every media pipeline
  * performs; formats per their public specs — PNG RFC 2083 §3.1/IHDR,
  * JPEG/JFIF ITU T.81 SOF segments, RIFF/WAVE fmt chunk, ISO 14496-12
  * box structure). No codec library is needed: container headers give
  * width/height/bit-depth (images), sample-rate/channels/bits (audio),
  * and timescale/duration (video) as plain byte arithmetic, so the
  * extraction runs at scan speed and is oracle-checkable as
  * deterministic math over the same bytes.
  *
  * Returned triple semantics per format:
  *   - png / jpeg: (width, height, bit depth / sample precision)
  *   - wav:        (sample rate, channels, bits per sample)
  *   - mp4:        (movie timescale, duration in timescale units, 0)
  * `ok = false` (and zeroed dims) on any malformed/truncated header —
  * loud-by-value, never an exception, so one corrupt asset cannot fail
  * a corpus-wide extraction job.
  */
object MediaHeaders {

  final case class Parsed(ok: Boolean, kind: String, dim1: Int, dim2: Int, depth: Int)
  private val Bad = Parsed(ok = false, "unknown", 0, 0, 0)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(k => (b(i + k) & 0xff) == s.charAt(k))

  /** Sniff the container by magic bytes and parse its header. */
  def parse(b: Array[Byte]): Parsed = {
    if (b == null || b.length < 12) Bad
    else if ((b(0) & 0xff) == 0x89 && ascii(b, 1, "PNG")) parsePng(b)
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) parseJpeg(b)
    else if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) parseWav(b)
    else if (ascii(b, 4, "ftyp")) parseMp4(b)
    else Bad
  }

  /** Byte offset where the container's SIGNAL data starts — the walk a
    * perceptual-hash pass performs before touching content bytes (the
    * decode stand-in: hash what the container CARRIES, never its
    * doc-id-derived header metadata). Per format:
    *   - png:  after the signature + IHDR chunk (8 + 12 + IHDR length);
    *   - jpeg: after the start-of-frame segment the header walk ends on;
    *   - wav:  the `data` chunk's payload (RIFF chunk walk from 12);
    *   - mp4:  the `mdat` box payload (top-level box walk).
    * -1 on any malformed/truncated container — loud-by-value like
    * [[parse]], one corrupt asset cannot fail a corpus-wide job. */
  def bodyOffset(b: Array[Byte]): Int = {
    if (b == null || b.length < 12) -1
    else if ((b(0) & 0xff) == 0x89 && ascii(b, 1, "PNG")) {
      if (b.length < 25 || !ascii(b, 12, "IHDR")) -1
      else {
        val off = 8 + 12 + be32(b, 8)
        if (off < 0 || off > b.length) -1 else off
      }
    } else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return -1
        val marker = b(i + 1) & 0xff
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          val off = i + 2 + be16(b, i + 2)
          return if (off > b.length) -1 else off
        } else if (marker == 0xd8 || marker == 0x01 ||
            (marker >= 0xd0 && marker <= 0xd7)) i += 2
        else i += 2 + be16(b, i + 2)
      }
      -1
    } else if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) {
      var c = 12
      while (c + 8 <= b.length) {
        val size = le32(b, c + 4)
        if (ascii(b, c, "data"))
          return if (size < 0 || c + 8 + size > b.length) -1 else c + 8
        if (size < 0) return -1
        c += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
      -1
    } else if (ascii(b, 4, "ftyp")) {
      var o = 0
      while (o + 8 <= b.length) {
        val size = be32(b, o)
        if (size < 8 || o + size > b.length) return -1
        if (ascii(b, o + 4, "mdat")) return o + 8
        o += size
      }
      -1
    } else -1
  }

  /** Declared byte length of the WAV `data` chunk whose payload starts
    * at `off` (a WAV [[bodyOffset]] return value — the chunk-size field
    * is the 4 bytes immediately before the payload). PCM walks must
    * bound themselves by it, not by end-of-payload: a valid WAV may
    * carry trailing chunks after `data` (LIST/INFO, id3 …) whose bytes
    * are metadata, not samples (ADVICE r15). [[bodyOffset]] already
    * validated `off + size <= b.length`, so the value is safe to trust
    * as an upper bound. */
  def wavDataLen(b: Array[Byte], off: Int): Int = le32(b, off - 4)

  /** PNG: 8-byte signature, then the IHDR chunk (must be first):
    * length(4) "IHDR" width(4 BE) height(4 BE) bitdepth(1) … */
  private def parsePng(b: Array[Byte]): Parsed = {
    if (b.length < 25 || !ascii(b, 12, "IHDR")) Bad
    else {
      val w = be32(b, 16); val h = be32(b, 20); val depth = b(24) & 0xff
      if (w <= 0 || h <= 0) Bad else Parsed(ok = true, "png", w, h, depth)
    }
  }

  /** JPEG: walk FF-marker segments from SOI until a start-of-frame
    * (SOF0/1/2) yields precision(1) height(2 BE) width(2 BE). */
  private def parseJpeg(b: Array[Byte]): Parsed = {
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return Bad
      val marker = b(i + 1) & 0xff
      if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
        if (i + 8 >= b.length) return Bad
        val depth = b(i + 4) & 0xff
        val h = be16(b, i + 5); val w = be16(b, i + 7)
        return if (w <= 0 || h <= 0) Bad else Parsed(ok = true, "jpeg", w, h, depth)
      } else if (marker == 0xd8 || marker == 0x01 ||
          (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // standalone marker, no length field
      } else {
        i += 2 + be16(b, i + 2) // segment length includes its own 2 bytes
      }
    }
    Bad
  }

  /** RIFF/WAVE: fmt chunk at the canonical offset — channels(LE16@22),
    * sample rate(LE32@24), bits per sample(LE16@34). */
  private def parseWav(b: Array[Byte]): Parsed = {
    if (b.length < 36 || !ascii(b, 12, "fmt ")) Bad
    else {
      val ch = le16(b, 22); val rate = le32(b, 24); val bits = le16(b, 34)
      if (ch <= 0 || rate <= 0) Bad else Parsed(ok = true, "wav", rate, ch, bits)
    }
  }

  /** ISO-BMFF (MP4): walk top-level size/type boxes; inside `moov`, the
    * `mvhd` version-0 box carries timescale(BE32@+20) and
    * duration(BE32@+24) relative to the box start. */
  private def parseMp4(b: Array[Byte]): Parsed = {
    var o = 0
    while (o + 8 <= b.length) {
      val size = be32(b, o)
      if (size < 8 || o + size > b.length) return Bad
      if (ascii(b, o + 4, "moov")) {
        var c = o + 8
        while (c + 8 <= o + size) {
          val csize = be32(b, c)
          if (csize < 8 || c + csize > o + size) return Bad
          if (ascii(b, c + 4, "mvhd")) {
            // Bounds BEFORE the version-byte read: with csize == 8 a
            // truncated mvhd can end exactly at the buffer, making
            // b(c + 8) an out-of-bounds read — an exception where the
            // contract is loud-by-VALUE (ok = false), and one corrupt
            // asset would kill the whole mapPartitions extraction.
            if (c + 28 > b.length || (b(c + 8) & 0xff) != 0) return Bad
            val timescale = be32(b, c + 20); val duration = be32(b, c + 24)
            return if (timescale <= 0) Bad
              else Parsed(ok = true, "mp4", timescale, duration, 0)
          }
          c += csize
        }
        return Bad
      }
      o += size
    }
    Bad
  }
}
