package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offline perceptual-fingerprint index over the media corpus side —
  * the staging table that makes media near-dup maintenance pay the
  * expensive per-payload work (container byte walk + md5-per-window
  * gram-SimHash, [[graft.functions.MediaHashKernel]]) ONCE per corpus
  * version instead of once per query. Same offline-build/online-probe
  * split and atomic-publish discipline as [[BandIndex]] /
  * [[PostingIndex]] / [[SemDedupIndex]], via [[graft.StagedAsset]].
  *
  * One staged table, `fps/` — (doc_id, fp): the 60-bit fingerprint per
  * base-side asset with a valid fingerprint. Narrow by construction
  * (two longs — payload bytes never enter the index); the banding is
  * derived in-plan at probe time from DISTINCT fingerprints
  * ([[MultimodalOps.fpPairs]]), which keeps the index schema
  * independent of the band shape — a banding change (like round 12's
  * 4×15-bit → 3-of-6 combinatorial swap) re-plans, it does not
  * rebuild.
  *
  * Consumers: q186 (add-batch twin — staged base ∪ in-plan batch) and
  * the streaming fingerprint maintainer
  * ([[graft.streaming.StreamingMediaMaintenance]], base ∪ delta
  * segments). */
object MediaFpIndex {

  private val LayoutVersion = 1

  def indexDir(s: SparkSession, dir: String): String = {
    val corpus = graft.SessionMemo.manifestDigest(s, s"$dir/documents.parquet")
    graft.StagedAsset.dir("mediafp", s"$dir|$corpus|mediafp" +
      s"|${NearDupOps.isNewDocKey}|v=$LayoutVersion")
  }

  /** Offline build over the corpus side (doc_id % 10 ≠ 7): hash every
    * base asset, stage the (doc_id, fp) frame. Runs as a scheduled
    * staging stage at scale; invoked lazily by [[ensure]] here. */
  def build(s: SparkSession, dir: String): String = {
    val idx = indexDir(s, dir)
    val tmp = graft.StagedAsset.tmpDir(idx)
    MultimodalOps.mediaFps(graft.Tables.tSpread(s, dir, "documents")
        .filter(!NearDupOps.isNewDoc(col("doc_id"))))
      .write.mode("overwrite").parquet(s"$tmp/fps")
    graft.StagedAsset.publish(s, tmp, idx, "fps/_SUCCESS",
      "media fingerprint index")
    idx
  }

  /** Build-if-absent, keyed by (corpus version, boundary, layout). */
  def ensure(s: SparkSession, dir: String): String =
    graft.StagedAsset.ensure(s, indexDir(s, dir), "fps/_SUCCESS") {
      build(s, dir)
    }

  /** The staged base-side (doc_id, fp) frame (build-if-absent). */
  def fps(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"${ensure(s, dir)}/fps")
}
