package graft

import org.apache.spark.sql.DataFrame

/** Lineage-cutting materialization for iterative / multi-consumer
  * intermediate frames (collapse frames, label-propagation rounds, the
  * TF frame) — the one place the repo decides HOW an intermediate is
  * made durable.
  *
  * Default is `localCheckpoint()`: blocks live in executor storage
  * (memory, then disk) with no replication. That is strictly the right
  * call at `local[32]` — a single JVM cannot lose an executor without
  * losing the driver too, and reliable checkpointing would pay an HDFS
  * round-trip for nothing.
  *
  * On a real cluster the trade flips: a localCheckpoint block lives on
  * exactly one executor AND truncates the lineage that could recompute
  * it, so one lost executor fails the whole job. Cluster runs should
  * set `spark.graft.reliableCheckpoint=true` (plus
  * `spark.graft.checkpointDir=hdfs://...`, typically alongside the
  * warehouse): every site in the repo then switches to reliable
  * `checkpoint()`, which survives executor loss at the cost of one
  * write+read through the fault-tolerant store. The frames routed
  * through here are all small relative to their inputs (dup members,
  * band digests, edge lists, per-doc term counts), so the reliable
  * write is cheap relative to the recompute it insures.
  */
object Materialize {

  val ReliableFlag = "spark.graft.reliableCheckpoint"
  val DirKey = "spark.graft.checkpointDir"

  /** Materialize `df` and cut its lineage, eagerly. */
  def stable(df: DataFrame): DataFrame = stableOwned(df)._1

  /** [[stable]] without the eager `count()` job: the checkpoint blocks
    * persist when the FIRST consumer action runs (Spark pins the
    * marked RDD's partitions as that job computes them), so a caller
    * whose very next statement aggregates the frame — the iterative
    * loops (HITS' per-half-step max, PageRank-style score frames) —
    * pays ONE job for compute+pin+aggregate instead of a pin job plus
    * a cached re-read. Lineage is cut exactly as in [[stable]] once
    * the first action fires. Use only where a consumer action
    * IMMEDIATELY follows on the same thread and the frame cannot be
    * swept before it runs (Bench/Verify sweep between queries only);
    * multi-consumer frames read from the pinned blocks after that
    * first action exactly as with [[stable]]. */
  def stableLazy(df: DataFrame): DataFrame = doStableLazy(df)

  /** [[stable]], plus the EXACT set of persistent-RDD ids this
    * materialization pinned — the ownership primitive SessionMemo's
    * protected-set bookkeeping needs to be sound under concurrency.
    *
    * Ownership is read DIRECTLY off the checkpointed Dataset's plan:
    * `Dataset.localCheckpoint` persists one internal RDD and returns a
    * Dataset whose analyzed plan is a `LogicalRDD` wrapping exactly
    * that RDD, so its id is the complete owned set — no global lock,
    * no persistent-RDD snapshot diff. (The first round-9 version
    * diffed the context-wide persistent-RDD map under a global lock;
    * a snapshot diff cannot distinguish our persist from a concurrent
    * query's, and the lock that made it exact also serialized every
    * AQE shuffle stage of concurrent materializations, because
    * `checkpoint(eager = false)` executes the plan — materializing
    * all adaptive stages — before `persist()` registers. Reading the
    * plan needs neither.) In reliable-checkpoint mode the wrapped RDD
    * is not persisted; protecting its id is a harmless no-op, as is
    * the lost-race unpersist. */
  def stableOwned(df: DataFrame): (DataFrame, Set[Int]) = {
    val built = doStableLazy(df)
    val owned = built.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.toSet
    // Eager materialization (the job both caches the blocks and
    // finalizes the checkpoint) — callers rely on stable() being
    // eager; only the ownership observation changed.
    built.count()
    (built, owned)
  }

  private def doStableLazy(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val reliable = s.conf.getOption(ReliableFlag).exists(_.toBoolean)
    if (!reliable) df.localCheckpoint(eager = false)
    else {
      if (s.sparkContext.getCheckpointDir.isEmpty) {
        val dir = s.conf.getOption(DirKey).getOrElse(
          sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-checkpoints")
        s.sparkContext.setCheckpointDir(dir)
      }
      df.checkpoint(eager = false)
    }
  }

  /** Run `body` with a tracked variant of [[stable]] and unpersist
    * every block it pinned when `body` returns — the deterministic
    * release for CONTINUOUS callers (streaming `foreachBatch`
    * maintainers), whose per-batch checkpoints are dead the moment the
    * batch's writes commit but would otherwise pile up across
    * thousands of micro-batches until a JVM GC let ContextCleaner
    * notice (the releaseTransient lesson, scoped to exactly the blocks
    * this body created instead of a global idle-point sweep). */
  def withTransient[A](body: (DataFrame => DataFrame) => A): A = {
    val owned =
      scala.collection.mutable.ArrayBuffer.empty[(org.apache.spark.SparkContext, Int)]
    val st: DataFrame => DataFrame = { df =>
      val (built, ids) = stableOwned(df)
      ids.foreach(id => owned += ((df.sparkSession.sparkContext, id)))
      built
    }
    try body(st)
    finally owned.foreach { case (sc, id) =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
    }
  }

  /** Drop every persisted RDD that is NOT one of SessionMemo's
    * cross-query frames. Harness loops (Bench, Verify) call this
    * between catalog queries: a finished query's localCheckpoint blocks
    * are dead the moment its sink action returns, but they stay in the
    * storage pool until a JVM GC lets ContextCleaner notice — and 175
    * queries × 3 repeats of dead blocks evict the LIVE working set of
    * whichever heavy query runs late in the session (measured: q129
    * pagerank 3.8 s solo vs 23.6 s at the tail of a full catalog run).
    * Explicit unpersist frees the pool without waiting for GC; the
    * memoized frames (protected ids) are exactly the blocks that ARE
    * meant to outlive their building query. */
  def releaseTransient(s: org.apache.spark.sql.SparkSession): Unit = {
    // Exclusive against in-flight memoized builds (SessionMemo holds
    // the read side for the whole build+register span): a sweep racing
    // a build would see the build's freshly-checkpointed,
    // not-yet-registered blocks as unprotected and unpersist them —
    // and a localCheckpoint's lineage is truncated, so the memoized
    // frame would THROW on next use, not recompute. tryLock, not lock:
    // the sweep is an optimization, so rather than stall the caller
    // behind a long build we skip and let the next idle-point sweep
    // catch up. This remains an IDLE-POINT operation for the calling
    // harness: per-query transient checkpoints of queries still
    // running in OTHER threads are not distinguishable from dead ones
    // and would be swept — call between queries, as Bench/Verify do.
    val wl = SessionMemo.sweepLock.writeLock()
    if (!wl.tryLock()) return
    try {
      // getPersistentRDDs is CONTEXT-wide while sessions are not —
      // keep every session's memo frames, not just the caller's, or a
      // sweep from one session would destroy a sibling's
      // lineage-truncated memoized blocks (Thrift server / notebook
      // posture).
      val keep = SessionMemo.allProtectedRddIds
      s.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!keep.contains(id)) rdd.unpersist(blocking = false)
      }
    } finally wl.unlock()
  }
}
