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
  *   - only names matching `b<digits>` count (a stray checkpoint or
  *     temp dir must not make `drop(1).toLong` throw);
  *   - ids STRICTLY BELOW `batchId` — a `b*` glob would also pick up
  *     `b<batchId>` left by a failed attempt of the SAME batch, so the
  *     replaying batch would see its own half-written state (the
  *     round-8 replay-idempotence lesson);
  *   - EXPLICIT schema — an empty aggregate writes a segment with zero
  *     part files, which schema inference cannot read; the explicit
  *     schema turns it into an empty frame instead of an
  *     AnalysisException that kills the stream. */
object DeltaDirs {

  /** Read `deltaDir/b<id>[/sub]` for every id < `batchId` as one frame
    * with the given schema; empty-frame-safe when nothing has landed. */
  def readSegs(s: SparkSession, deltaDir: String, sub: String,
      schema: StructType, batchId: Long = Long.MaxValue): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(deltaDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val dirs =
      if (fs.exists(p))
        fs.listStatus(p).toSeq.map(_.getPath)
          .filter(q => q.getName.matches("b\\d+") &&
            q.getName.drop(1).toLong < batchId)
          .map(q => if (sub.isEmpty) q else new org.apache.hadoop.fs.Path(q, sub))
          // A maintainer that crashed BETWEEN its two segment writes
          // (e.g. semDedupMaintain lands b<N>/edges but not b<N>/vecs)
          // leaves a half-written batch; an unbounded probe-time read
          // (batchId = MaxValue, which no replay ever heals) would then
          // throw path-does-not-exist forever. Skip missing sub paths
          // so the half batch degrades to missing rows — exactly what a
          // replay of that batch will overwrite — instead of an
          // AnalysisException. exists() per landed batch is one
          // namenode RTT each; batch dirs are compacted/bounded, and
          // correctness of a crash window beats the listing cost.
          .filter(q => sub.isEmpty || fs.exists(q))
          .map(_.toString)
      else Nil
    if (dirs.nonEmpty) s.read.schema(schema).parquet(dirs: _*)
    else s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
