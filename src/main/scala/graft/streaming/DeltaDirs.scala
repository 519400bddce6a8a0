package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** THE `b<id>` delta-directory read, defined once for every streaming
  * maintainer — previously five near-verbatim copies whose drift had
  * already produced a real crash bug (the digest maintainer's copy
  * relied on parquet schema INFERENCE, which throws on a segment with
  * zero part files — exactly what a batch with nothing first-seen
  * writes; every sibling passed an explicit schema).
  *
  * Contract pieces, all mandatory for replay safety:
  *   - only names matching `b<digits>` / `c<digits>` count (a stray
  *     checkpoint or temp dir must not make `drop(1).toLong` throw);
  *   - ids STRICTLY BELOW `batchId` — a `b*` glob would also pick up
  *     `b<batchId>` left by a failed attempt of the SAME batch, so the
  *     replaying batch would see its own half-written state (the
  *     round-8 replay-idempotence lesson);
  *   - EXPLICIT schema — an empty aggregate writes a segment with zero
  *     part files, which schema inference cannot read; the explicit
  *     schema turns it into an empty frame instead of an
  *     AnalysisException that kills the stream.
  *
  * ==Compaction==
  *
  * Without compaction every micro-batch appends a `b<id>` dir and every
  * later batch lists-and-unions ALL of them — a batch-count-dependent
  * cost the round-10 soak measured at ~1.7 ms per accumulated dir
  * (1.36 s → ~5.8 s per batch over 2500 batches). [[compact]] folds the
  * accumulated segments into a single `c<W>` dir ("compacted through
  * watermark W"), after which [[readSegs]] reads `c<W>` plus only the
  * `b<id>` dirs with `W < id < batchId`, so the per-batch listing cost
  * is bounded by the compaction cadence, not the stream's age.
  *
  * The fold is ROW-PRESERVING — `c<W>` holds exactly the union of the
  * rows of the segments it covers — so compacted and uncompacted reads
  * are row-for-row identical for every consumer (all downstream use is
  * order-free unions feeding joins/aggregates), and one fold
  * implementation serves all five maintainer families with no
  * family-specific merge math. Global stat recomputation (e.g. the band
  * family's per-segment saturation stats) remains the offline base
  * rebuild's job, as before.
  *
  * Crash safety of the fold, step by step:
  *   1. the fold is written to a private `c<W>.tmp-<uuid>` dir (ignored
  *      by [[readSegs]]: the name doesn't full-match `c\d+`), with a
  *      `_COMPACTED` marker file written LAST (underscore-prefixed, so
  *      parquet scans skip it);
  *   2. one atomic rename publishes it as `c<W>` — a reader sees the
  *      dir whole or not at all, and a markerless `c<W>` (non-atomic
  *      FS crash window) is skipped by readers;
  *   3. only THEN are the folded `b<id>` (id ≤ W) and superseded
  *      `c<W'>` (W' < W) dirs pruned. A crash between 2 and 3 leaves
  *      both the fold and its inputs; readers take the max complete
  *      watermark and ignore covered `b` dirs, so nothing is
  *      double-counted, and the next [[compact]] call finishes the
  *      prune.
  *
  * Replay safety: a maintainer calls [[compact]] only with
  * `upTo = batchId`, i.e. it folds only batches STRICTLY BEFORE the
  * in-flight one — all committed (Structured Streaming starts batch N
  * only after N-1's commit), never the in-flight batch's own possibly-
  * replayed segment. Hence every `c<W>` ever published has W < every
  * live batch id, and a replaying batch reads exactly the same rows it
  * saw before the crash (DeltaDirsSpec pins this). */
object DeltaDirs {

  private def fsOf(s: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p, p.getFileSystem(s.sparkContext.hadoopConfiguration))
  }

  private val Marker = "_COMPACTED"

  /** (complete compacted watermark or -1, live b-ids above it), both
    * restricted to ids strictly below `batchId`. One listing. */
  private def layout(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, batchId: Long): (Long, Seq[Long]) = {
    if (!fs.exists(p)) return (-1L, Nil)
    val names = fs.listStatus(p).toSeq.map(_.getPath.getName)
    val w = names.filter(_.matches("c\\d+")).map(_.drop(1).toLong)
      .filter(_ < batchId)
      // a markerless c dir is a crashed non-atomic publish: skip it
      .filter(cw => fs.exists(
        new org.apache.hadoop.fs.Path(p, s"c$cw/$Marker")))
      .sorted.lastOption.getOrElse(-1L)
    val bs = names.filter(_.matches("b\\d+")).map(_.drop(1).toLong)
      .filter(id => id > w && id < batchId).sorted
    (w, bs)
  }

  /** Read `deltaDir/b<id>[/sub]` for every id < `batchId` — through the
    * compacted `c<W>` dir where one covers a prefix — as one frame with
    * the given schema; empty-frame-safe when nothing has landed. */
  def readSegs(s: SparkSession, deltaDir: String, sub: String,
      schema: StructType, batchId: Long = Long.MaxValue): DataFrame = {
    val (p, fs) = fsOf(s, deltaDir)
    val (w, bs) = layout(fs, p, batchId)
    val cDir =
      if (w < 0) Nil
      else {
        val q0 = new org.apache.hadoop.fs.Path(p, s"c$w")
        val q = if (sub.isEmpty) q0 else new org.apache.hadoop.fs.Path(q0, sub)
        // a sub that was empty at every covered batch folds to an empty
        // (or absent, for a half-written covered batch) dir — same
        // missing-rows degradation as the b-dir guard below
        if (sub.isEmpty || fs.exists(q)) Seq(q.toString) else Nil
      }
    val bDirs = bs
      .map(id => new org.apache.hadoop.fs.Path(p, s"b$id"))
      .map(q => if (sub.isEmpty) q else new org.apache.hadoop.fs.Path(q, sub))
      // A maintainer that crashed BETWEEN its two segment writes
      // (e.g. semDedupMaintain lands b<N>/edges but not b<N>/vecs)
      // leaves a half-written batch; an unbounded probe-time read
      // (batchId = MaxValue, which no replay ever heals) would then
      // throw path-does-not-exist forever. Skip missing sub paths
      // so the half batch degrades to missing rows — exactly what a
      // replay of that batch will overwrite — instead of an
      // AnalysisException. exists() per live batch is one namenode
      // RTT each; compaction keeps the live set small, and
      // correctness of a crash window beats the listing cost.
      .filter(q => sub.isEmpty || fs.exists(q))
      .map(_.toString)
    val dirs = cDir ++ bDirs
    if (dirs.nonEmpty) s.read.schema(schema).parquet(dirs: _*)
    else s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Fold every delta segment with id < `upTo` into one compacted
    * `c<W>` dir (W = the highest folded id) and prune the covered
    * dirs. `subs` names each sub-table with its explicit schema (one
    * `("", schema)` entry for flat families). Row-preserving, atomic,
    * crash-resumable (scaladoc above). No-op (beyond finishing a
    * crashed predecessor's prune) when nothing new has landed.
    * Returns true iff a new watermark was published. */
  def compact(s: SparkSession, deltaDir: String,
      subs: Seq[(String, StructType)], upTo: Long): Boolean = {
    val (p, fs) = fsOf(s, deltaDir)
    val (w, bs) = layout(fs, p, upTo)
    // finish a crashed predecessor's prune: anything at or below the
    // complete watermark is covered garbage, as are stale fold tmps
    // and ANY marker-less `c<id>` dir at ANY watermark — a complete
    // publish carries the marker (written into the tmp BEFORE the
    // rename), so a marker-less one is by definition a crashed
    // non-atomic publish. It must be deleted here, not merely skipped:
    // Hadoop's rename-onto-existing-dir contract NESTS the source
    // inside the destination, so a leftover marker-less `c<W>` would
    // swallow the next fold's tmp (marker ends up nested, readers keep
    // skipping the dir) while prune deletes the fold's inputs — silent
    // row loss. Readers skipping it (in `layout`) handles the read
    // path; this handles liveness of the write path.
    def prune(through: Long): Unit =
      if (fs.exists(p)) fs.listStatus(p).toSeq.map(_.getPath).foreach { q =>
        val n = q.getName
        val covered =
          (n.matches("b\\d+") && n.drop(1).toLong <= through) ||
          (n.matches("c\\d+") && n.drop(1).toLong < through) ||
          (n.matches("c\\d+") &&
            !fs.exists(new org.apache.hadoop.fs.Path(q, Marker))) ||
          n.matches("c\\d+\\.tmp-.*")
        if (covered) fs.delete(q, true)
      }
    // heal crashed publishes BEFORE folding, so the rename target is
    // guaranteed free (layout already ignored marker-less dirs, so the
    // watermark/live-set computation is unaffected by this delete)
    prune(w)
    if (bs.isEmpty) return false
    val newW = bs.max
    val tmp = s"$deltaDir/c$newW.tmp-${java.util.UUID.randomUUID}"
    subs.foreach { case (sub, schema) =>
      val out = if (sub.isEmpty) tmp else s"$tmp/$sub"
      // reads c<w> ∪ b<id> for w < id ≤ newW — exactly the cover set
      readSegs(s, deltaDir, sub, schema, newW + 1)
        .write.mode("overwrite").parquet(out)
    }
    val markerTmp = new org.apache.hadoop.fs.Path(s"$tmp/$Marker")
    val mo = fs.create(markerTmp, true); mo.close()
    val outPath = new org.apache.hadoop.fs.Path(s"$deltaDir/c$newW")
    // never rename onto an occupied path (it would NEST, not replace):
    // a marker-less occupant is a crash that landed after the up-front
    // heal — delete it; a markered one means this exact watermark was
    // published since our listing (a replay finishing first) — our
    // fold is redundant, keep theirs.
    if (fs.exists(outPath)) {
      if (fs.exists(new org.apache.hadoop.fs.Path(outPath, Marker))) {
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
        prune(newW)
        return true
      }
      fs.delete(outPath, true)
    }
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), outPath)) {
      // single-writer discipline makes this unreachable in a correct
      // deployment; degrade loudly rather than double-count
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      throw new IllegalStateException(
        s"delta compaction rename lost at $outPath — concurrent writer?")
    }
    prune(newW)
    true
  }
}
