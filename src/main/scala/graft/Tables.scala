package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet fixtures (`TESTDATA.md`).
  *
  * One parquet file per table; Spark's vectorized parquet reader plus
  * Catalyst column pruning / predicate pushdown make `spark.read.parquet`
  * the right scan primitive at any scale (reference scans:
  * silver_processor.py:26-34). At 100 TB the same call reads a
  * partitioned directory tree instead of a single file — call sites do
  * not change.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one fixture table from `dir` (e.g. /root/testdata/sf0.01).
    *
    * Schema-on-read is declared, not inferred (schema.Schemas, SURVEY
    * §1.3): the footer is validated against the declaration once per
    * path (fail-fast on drift, a metadata-only check), then the scan
    * runs with the declared StructType.
    *
    * `events.ts` is parquet timestamp[us] without timezone
    * (TIMESTAMP_NTZ); we cast to the session TimestampType in one place
    * so every downstream window/watermark/compare sees one type. All
    * session builders in this repo pin the session timezone to UTC, so
    * the cast is numerically the identity. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val declared = graft.schema.Schemas.fixture(name)
    graft.schema.Schemas.validateOnce(spark, path, name, declared)
    val df = spark.read.schema(declared).parquet(path)
    if (name == "events") toSessionTs(df) else df
  }

  /** NTZ → session TimestampType; the one conversion rule, shared with
    * the streaming reader. */
  def toSessionTs(df: DataFrame): DataFrame =
    df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))

  /** On-disk size of a fixture table from filesystem metadata only — no
    * Spark job. Used to size LSH structures at plan-construction time
    * (an eager count() there would execute a scan just to build the
    * plan). */
  def tableSizeBytes(spark: SparkSession, dir: String, name: String): Long = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(path).getLength
  }

  /** Like [[t]], but fans small inputs out to the session's default
    * parallelism. A small fixture table is one parquet file → one input
    * split, so a CPU-dense per-row kernel (shingle-TF, hyperplane
    * codes, minhash) would run single-threaded; redistributing a few
    * hundred KB costs nothing. Guarded by size so it never triggers at
    * scale — a big table is already split by `files.maxPartitionBytes`,
    * and repartitioning it would be a full-corpus shuffle. */
  def tSpread(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = t(spark, dir, name)
    if (tableSizeBytes(spark, dir, name) < 64L * 1024 * 1024)
      df.repartition(spark.sparkContext.defaultParallelism)
    else df
  }

  /** Register every fixture table as a temp view (for spark.sql paths). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
