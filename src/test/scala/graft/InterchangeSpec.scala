package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The interchange fidelity contract (sources.Interchange): JSONL and
  * CSV export+ingest round-trip ARBITRARY text losslessly — quotes,
  * newlines, tabs, unicode incl. non-BMP surrogate pairs, backslashes,
  * empty strings, and NULLs. The catalog queries (q176/q177) prove the
  * corpus path under the DuckDB hash oracle; this spec proves the
  * escaping machinery on text the synthetic fixture never exercises,
  * through the SAME writer/reader option sets (exportFrame/readBack),
  * so the tested path cannot drift from the shipped path.
  */
class InterchangeSpec extends AnyFunSuite {
  import TestSpark._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)))

  private val adversarial: Seq[Row] = Seq(
    Row(1L, "plain ascii words", "en"),
    Row(2L, "embedded \"double quotes\" and 'single'", "en"),
    Row(3L, "line\nbreak and\r\nCRLF and tab\there", "en"),
    Row(4L, "comma, semicolon; pipe| — the CSV separators", "en"),
    Row(5L, "unicode: Schnee ☃, CJK 数据管道, emoji 🦙 (surrogate pair)", "zh"),
    Row(6L, "back\\slash and \\N lookalike inside longer text", "en"),
    Row(7L, "", "en"),          // empty string, must NOT become null
    Row(8L, null, "en"),        // null, must NOT become ""
    Row(9L, "  leading and trailing spaces  ", "en"),
    Row(10L, "json specials: {\"k\": [1,2]} </closing> &amp;", "en"))

  private def roundtrip(fmt: String): Unit = {
    val in = spark.createDataFrame(
      spark.sparkContext.parallelize(adversarial, 2), schema)
    val dir = java.nio.file.Files.createTempDirectory(s"ichg-$fmt").toString
    sources.Interchange.exportFrame(in, dir, fmt)
    val back = sources.Interchange.readBack(spark, dir, fmt, schema)
    val got = back.orderBy("doc_id").collect().toSeq
    val want = adversarial.sortBy(_.getLong(0))
    assert(got.size == want.size, s"$fmt: row count ${got.size} != ${want.size}")
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"$fmt: row ${w.get(0)} round-tripped to $g, want $w")
    }
  }

  test("JSONL round-trips adversarial text exactly") { roundtrip("jsonl") }

  test("CSV round-trips adversarial text exactly") { roundtrip("csv") }

  test("corpus round-trip queries match the parquet original at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val want = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
      .orderBy("doc_id").collect().toSeq
    Seq("q176_jsonl_roundtrip" -> sources.Interchange.jsonlRoundtrip _,
        "q177_csv_roundtrip" -> sources.Interchange.csvRoundtrip _)
      .foreach { case (name, fn) =>
        val got = fn(spark, dir).collect().toSeq
        assert(got == want, s"$name diverged from the parquet original")
      }
  }

  test("quarantine ingest splits good rows from verbatim-preserved bad lines") {
    val dir = java.nio.file.Files.createTempDirectory("ichg-quar").toString
    val lines = Seq(
      "{\"doc_id\": 1, \"text\": \"good one\", \"lang\": \"en\"}",
      "this is not json",
      "{\"doc_id\": 2, \"text\": \"good two\", \"lang\": \"de\"}",
      "{\"doc_id\": \"not-a-number\", \"text\": \"bad type\", \"lang\": \"fr\"}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-00000.json"),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    val (good, bad) =
      sources.Interchange.readWithQuarantine(spark, dir, "jsonl", schema)
    val g = good.orderBy("doc_id").collect().toSeq
    assert(g.map(_.getLong(0)) == Seq(1L, 2L),
      s"good rows wrong: $g")
    assert(g.map(_.getString(1)) == Seq("good one", "good two"))
    val b = bad.collect().map(_.getString(0)).toSet
    assert(b == Set(lines(1), lines(3)),
      s"quarantine must preserve bad lines verbatim, got $b")
  }

  test("FAILFAST ingest rejects a corrupt JSONL line loudly") {
    val dir = java.nio.file.Files.createTempDirectory("ichg-corrupt").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-00000.json"),
      "{\"doc_id\": 1, \"text\": \"ok\", \"lang\": \"en\"}\nnot json at all\n"
        .getBytes("UTF-8"))
    val ex = intercept[Exception] {
      sources.Interchange.readBack(spark, dir, "jsonl", schema).collect()
    }
    assert(ex.getMessage != null)
  }
}
