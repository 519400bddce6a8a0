package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Text-interchange surfaces for the documents corpus: a JSONL export/
  * ingest pair (q176) and a CSV pair (q177), each verified LOSSLESS by
  * round-tripping the whole fixture corpus under the full DuckDB hash
  * oracle (export → schema-declared read-back ≡ the parquet original).
  *
  * Why these exist: parquet is the warehouse format, but corpus
  * EXCHANGE between pipelines is overwhelmingly JSON Lines (every
  * public LLM corpus — C4, The Pile, RedPajama, Dolma — ships as
  * .jsonl.gz), with CSV still the lingua franca for tabular handoffs.
  * An engine that claims the training-data pipeline surface needs the
  * ingest side (schema-declared, inference OFF, FAILFAST on corruption)
  * and the export side (escaping that round-trips arbitrary text) as
  * first-class, tested operators — "we write parquet" does not cover
  * handing a corpus to a tokenizer team.
  *
  * 100 TB posture:
  *   - **Schema declared on read, never inferred** — inference is a
  *     full extra pass over the data before the real job starts.
  *   - **FAILFAST mode** — at scale a silently null-filled corrupt
  *     line (PERMISSIVE's default) is corpus corruption you discover
  *     at training time; a loud fail at ingest is the cheap failure.
  *   - **Parallelism = file count**: gzip members are not splittable,
  *     so the export writes one file per input partition and the
  *     read-back gets one task per file. An export that must feed a
  *     wider cluster repartitions first (files ∝ target parallelism).
  *   - **JSONL over CSV for text**: embedded newlines force the CSV
  *     reader into multiLine mode, which parses each FILE as one
  *     unsplittable unit and forfeits intra-file parallelism even for
  *     uncompressed data. JSON escapes newlines instead (`\n` inside
  *     the string literal), so every line is a record boundary and the
  *     format stays trivially line-splittable. q177 exists because CSV
  *     handoffs exist; its scaladoc is the argument for q176.
  *     MEASURED (round-8 ScaleSoak, synthetic corpus, local[32]):
  *     {{{
  *       decade   jsonl_ingest   csv_ingest   ratio
  *       1×            ~1 s          ~1 s       ~1×
  *       10×           ~2 s         ~40 s      ~20×   (super-linear)
  *       100×   (projected linear)  (×21/decade)  CSV past viability
  *     }}}
  *     CSV ingest grows ~21× per corpus decade (one multiLine parse
  *     task per gzip file) vs JSONL's ~linear slope; the soak harness
  *     prints a GUARD line with the measured ratio at each decade so
  *     the >100× recommendation — JSONL, full stop — rests on numbers.
  *
  * Fidelity rules (pinned by InterchangeSpec on adversarial text —
  * quotes, newlines, tabs, unicode incl. surrogate pairs, backslashes,
  * empty strings, nulls):
  *   - JSONL: Jackson escaping both ways; nulls round-trip as omitted
  *     fields. No caveats.
  *   - CSV: RFC-4180 quoting (`escape` = the quote char itself), with
  *     the Hive/MySQL `\N` sentinel distinguishing NULL from the empty
  *     string (Spark's writer otherwise emits both as nothing). The
  *     one caveat: a field whose literal content is exactly `\N` would
  *     read back as NULL — the standard, documented ambiguity of the
  *     sentinel convention; corpora that could contain it belong in
  *     JSONL (which has no sentinel).
  *
  * The export is STAGED like the offline indexes (BandIndex pattern):
  * cache dir keyed on the corpus per-file manifest digest, build into
  * a tmp dir, single atomic rename, completeness keyed on `_SUCCESS`.
  * Re-running a round-trip query re-reads the published export; a
  * changed corpus changes the key and rebuilds.
  */
object Interchange {

  /** Bump on any change to writer/reader options or layout. */
  private val LayoutVersion = 1

  private val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  /** NULL sentinel for the CSV pair — see fidelity rules above. */
  val CsvNullSentinel = "\\N"

  /** One definition of each format's writer options, shared by the
    * corpus export and the spec's adversarial round-trip — the option
    * sets CANNOT drift between the tested path and the catalog path. */
  def exportFrame(df: DataFrame, path: String, fmt: String): Unit = fmt match {
    case "jsonl" =>
      df.write.mode("overwrite")
        .option("compression", "gzip")
        .json(path)
    case "csv" =>
      df.write.mode("overwrite")
        .option("header", "true")
        .option("quote", "\"")
        .option("escape", "\"")
        .option("nullValue", CsvNullSentinel)
        // The WRITER trims by default (univocity) — that is data loss
        // for text; the reader's default is already no-trim.
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .option("compression", "gzip")
        .csv(path)
    case other => throw new IllegalArgumentException(s"unknown format $other")
  }

  /** Schema-declared, inference-off, FAILFAST read-back. */
  def readBack(s: SparkSession, path: String, fmt: String,
               schema: StructType): DataFrame = fmt match {
    case "jsonl" =>
      s.read.schema(schema)
        .option("mode", "FAILFAST")
        .json(path)
    case "csv" =>
      s.read.schema(schema)
        .option("header", "true")
        .option("quote", "\"")
        .option("escape", "\"")
        .option("nullValue", CsvNullSentinel)
        // Embedded newlines inside quoted fields — the unsplittable
        // mode the scaladoc warns about; correctness first.
        .option("multiLine", "true")
        .option("mode", "FAILFAST")
        .csv(path)
    case other => throw new IllegalArgumentException(s"unknown format $other")
  }

  /** PERMISSIVE quarantine ingest — the production-posture complement
    * of [[readBack]]'s FAILFAST: at 100 TB you do not kill a
    * 1000-executor job for three bad lines, you route them. Parses the
    * input ONCE (the parsed frame is materialized via
    * [[graft.Materialize.stable]] — without it the good/bad split
    * would re-read and re-parse the entire input twice, and Spark
    * additionally refuses plans that prune down to only the corrupt
    * column), then splits into (good rows with the declared schema,
    * quarantined raw lines preserved VERBATIM for replay after the
    * producer is fixed). The caller owns loud accounting: a quarantine
    * count that is not asserted against an expectation is silent data
    * loss with extra steps. */
  def readWithQuarantine(s: SparkSession, path: String, fmt: String,
                         schema: StructType): (DataFrame, DataFrame) = {
    val crCol = "_corrupt_record"
    val withCr = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(crCol,
        org.apache.spark.sql.types.StringType, nullable = true))
    val raw = fmt match {
      case "jsonl" =>
        s.read.schema(withCr)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", crCol)
          .json(path)
      case "csv" =>
        s.read.schema(withCr)
          .option("header", "true")
          .option("quote", "\"")
          .option("escape", "\"")
          .option("nullValue", CsvNullSentinel)
          .option("multiLine", "true")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", crCol)
          .csv(path)
      case other => throw new IllegalArgumentException(s"unknown format $other")
    }
    val parsed = graft.Materialize.stable(raw)
    val good = parsed.filter(col(crCol).isNull).drop(crCol)
    val bad = parsed.filter(col(crCol).isNotNull)
      .select(col(crCol).as("raw_line"))
    (good, bad)
  }

  private def exportDir(s: SparkSession, dir: String, fmt: String): String = {
    val corpus = graft.SessionMemo.manifestDigest(s, s"$dir/documents.parquet")
    graft.StagedAsset.dir(s"ichg_$fmt",
      s"$dir|$corpus|interchange|$fmt|v=$LayoutVersion")
  }

  /** Build-if-absent staged export (atomic publish, BandIndex
    * discipline). Returns the published directory. */
  def ensure(s: SparkSession, dir: String, fmt: String): String = {
    val out = exportDir(s, dir, fmt)
    graft.StagedAsset.ensure(s, out, "_SUCCESS") {
      val tmp = graft.StagedAsset.tmpDir(out)
      exportFrame(
        graft.Tables.t(s, dir, "documents").select(docCols.map(col): _*),
        tmp, fmt)
      graft.StagedAsset.publish(s, tmp, out, "_SUCCESS",
        "interchange export")
    }
  }

  private def roundtrip(s: SparkSession, dir: String, fmt: String): DataFrame =
    readBack(s, ensure(s, dir, fmt), fmt,
      graft.schema.Schemas.fixture("documents"))
      .select(docCols.map(col): _*)
      .orderBy("doc_id")

  /** q176 — JSONL export + schema-declared ingest, whole corpus. */
  def jsonlRoundtrip(s: SparkSession, dir: String): DataFrame =
    roundtrip(s, dir, "jsonl")

  /** q177 — CSV export + schema-declared ingest, whole corpus. */
  def csvRoundtrip(s: SparkSession, dir: String): DataFrame =
    roundtrip(s, dir, "csv")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q176_jsonl_roundtrip" -> jsonlRoundtrip,
    "q177_csv_roundtrip" -> csvRoundtrip)

  /** Identity over the parquet original: a full-hash pass proves the
    * export+ingest pair lost NOTHING (values, types, nulls, row set). */
  private val identityOracle =
    "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id"

  val oracleSql: Map[String, String] = Map(
    "q176_jsonl_roundtrip" -> identityOracle,
    "q177_csv_roundtrip" -> identityOracle)
}
