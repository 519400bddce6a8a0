package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offline LSH band index over the existing corpus — the staging table
  * that makes incremental near-dup ingestion (q84) cost O(batch), not
  * O(corpus), per run. Same offline-build/online-probe split as
  * [[IvfIndex]], same atomic-publish discipline.
  *
  * A continuously-ingesting pipeline re-checks every incoming batch
  * against everything already ingested. Re-banding the corpus per batch
  * (what the self-contained q76 necessarily does) re-pays the corpus
  * scan + signature + band shuffle every run; at 100 TB that is the
  * whole cost. Staged, the corpus side is computed ONCE per corpus
  * version:
  *
  *   - `digests/` — one row per distinct corpus text:
  *     (digest, rep_id, n_sh): md5 of the text, the min-id canonical
  *     doc, and its 3-gram shingle-set size (0 when too short to
  *     shingle — such groups emit no pairs under the brute-force
  *     contract). This is the exact-dup lookup side: a batch doc whose
  *     digest matches is a jaccard-1 dup of the whole group.
  *   - `dups/` — (rep_id, doc_id) non-representative members of
  *     multi-member groups (the collapse frame, proportional to the
  *     corpus dup rate).
  *   - `bands/` — (band, doc_id, band_n, hub_rank): the 16 MinHash band
  *     digests per shingleable representative, with the per-band member
  *     count and min-id rank PRE-computed so the probe can apply the
  *     saturated-band star guard without re-counting the corpus.
  *
  * All three tables are narrow (ids + 8/16-byte digests — document text
  * never enters the index). The index is keyed on the corpus version
  * (path | bytes | mtime | layout), staged into a temp dir and
  * published by a single atomic rename, completeness keyed on
  * `bands/_SUCCESS` — a concurrent probe can never read a half-written
  * index, and content drift rebuilds under a fresh key. */
object BandIndex {

  private def cacheRoot: String =
    sys.env.getOrElse("GRAFT_INDEX_DIR",
      sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-index")

  /** Bump on any change to band parameters, schemas, or kernel code. */
  private val LayoutVersion = 1

  def indexDir(s: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val bytes = fs.getContentSummary(p).getLength
    val id = s"$dir|$bytes|${st.getModificationTime}|bands|v=$LayoutVersion"
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(id.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    s"$cacheRoot/bands_$key"
  }

  /** Offline build over the existing-corpus side (everything that is
    * not the incoming batch). Runs as a scheduled staging stage at
    * scale; invoked lazily by [[ensure]] here. */
  def build(s: SparkSession, dir: String): String = {
    import graft.functions.HashKernels.shingle_array
    val idx = indexDir(s, dir)
    val tmp = s"$idx.tmp-${java.util.UUID.randomUUID}"
    val old = graft.Tables.tSpread(s, dir, "documents")
      .filter(!NearDupOps.isNewDoc(col("doc_id")))
      .select(col("doc_id"), col("text"), md5(col("text")).as("digest"))
    val groups = old.groupBy("digest").agg(min(col("doc_id")).as("rep_id"))
    val dups = old.select("doc_id", "digest")
      .join(groups, Seq("digest"))
      .filter(col("doc_id") =!= col("rep_id"))
      .select("rep_id", "doc_id")
      .localCheckpoint()
    val reps = old
      .join(dups.select("doc_id"), Seq("doc_id"), "left_anti")
    reps
      .select(col("digest"), col("doc_id").as("rep_id"),
        when(size(graft.functions.Tokenize.tokens(col("text"))) >= 3,
          size(shingle_array(col("text"), 3)).cast("long"))
          .otherwise(0L).as("n_sh"))
      .write.mode("overwrite").parquet(s"$tmp/digests")
    dups.write.mode("overwrite").parquet(s"$tmp/dups")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("band"))
    NearDupOps.mhBandedFor(reps.select("doc_id", "text"))
      .withColumn("band_n", count(lit(1)).over(w).cast("long"))
      .withColumn("hub_rank",
        row_number().over(w.orderBy(col("doc_id"))).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/bands")
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val idxPath = new org.apache.hadoop.fs.Path(idx)
    val marker = new org.apache.hadoop.fs.Path(s"$idx/bands/_SUCCESS")
    if (fs.exists(idxPath) && !fs.exists(marker)) fs.delete(idxPath, true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), idxPath)) {
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      if (!fs.exists(marker))
        throw new IllegalStateException(
          s"band index publish failed and no complete index exists at $idx")
    }
    idx
  }

  /** Build-if-absent, keyed by corpus version. */
  def ensure(s: SparkSession, dir: String): String = {
    val idx = indexDir(s, dir)
    val marker = new org.apache.hadoop.fs.Path(s"$idx/bands/_SUCCESS")
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) build(s, dir) else idx
  }
}
