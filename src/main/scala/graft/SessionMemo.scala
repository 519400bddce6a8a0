package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for MATERIALIZED derived frames that several
  * catalog queries share (the co-purchase edge list, the q62 dup
  * clusters): first caller pays the build, the rest reuse the blocks —
  * the in-session form of the staged-index pattern
  * (IvfIndex/BandIndex/SemDedupIndex `ensure`). At 100 TB this is the
  * difference between one derived-asset build per session and one per
  * consuming query.
  *
  * Weak session keys so a closed session's blocks become collectable.
  * The Materialize reliable-checkpoint flag is part of the key: a frame
  * materialized under one durability policy is never served to a
  * session re-configured for another (MaterializeSpec toggles exactly
  * this). `ConcurrentHashMap.computeIfAbsent` is NOT reentrant — builds
  * that recurse into other memoized builds (edges → incidence) need the
  * get/putIfAbsent shape below; duplicate concurrent builds are
  * deterministic and idempotent, first registration wins. */
object SessionMemo {

  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  /** Corpus-version key component — path | bytes | mtime of one fixture
    * file, the BandIndex identity rule: a rewritten fixture can never
    * be served a stale memoized frame (callers fold this into their
    * key). One filesystem stat, no job. */
  def versionOf(s: SparkSession, dir: String, table: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    s"$dir/$table|${fs.getContentSummary(p).getLength}|${st.getModificationTime}"
  }

  /** Materialize (Materialize.stable) and cache `build`'s frame under
    * (session, key, durability-policy). */
  def materialized(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val m = cache.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    val reliable = s.conf.getOption(Materialize.ReliableFlag).exists(_.toBoolean)
    val k = s"$key|reliable=$reliable"
    val cached = m.get(k)
    if (cached != null) cached
    else {
      val built = Materialize.stable(build)
      val prev = m.putIfAbsent(k, built)
      if (prev != null) prev else built
    }
  }
}
