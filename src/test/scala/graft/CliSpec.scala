package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
import org.scalatest.funsuite.AnyFunSuite
import graft.erathia.Cli

/** Scripted full-session drive of the interactive CLI (reference
  * main.py:349-386): bronze → silver → gold → report view → exit, plus
  * the error paths (bad input, out-of-order stages). */
class CliSpec extends AnyFunSuite {
  import TestSpark._

  private def run(script: String, outDir: String): String = {
    val in = new BufferedReader(new StringReader(script))
    val bytes = new ByteArrayOutputStream()
    val out = new PrintStream(bytes, true, "UTF-8")
    Cli.loop(spark, outDir, in, out)
    bytes.toString("UTF-8")
  }

  test("weeks prompt: default, estimate, and invalid-input recovery") {
    val in = new BufferedReader(new StringReader("abc\n-5\n\n"))
    val bytes = new ByteArrayOutputStream()
    val out = new PrintStream(bytes, true, "UTF-8")
    val weeks = Cli.promptWeeks(in, out, default = 104)
    val text = bytes.toString("UTF-8")
    assert(weeks == 104)
    assert(text.contains("valid integer"))
    assert(text.contains("must be positive"))
    assert(text.contains("~10,920 rows")) // 104 weeks x 105 trades
  }

  test("full scripted session: pipeline, reports, clean, exit") {
    val outDir = java.nio.file.Files.createTempDirectory("cliSess").toString + "/run"
    // 4 = full pipeline (20 weeks), 5 = reports (view #1, quit), 6 = clean, 7 = exit
    val text = run("4\n20\n5\n1\nQ\n6\n7\n", outDir)
    assert(text.contains("Estimated transactions: ~2,100 rows."))
    assert(text.contains("full pipeline: done."))
    assert(text.contains("Available reports:"))
    assert(text.contains("== "))
    // the report body itself must flow through the injected stream
    // (DataFrame.show would bypass it to real stdout)
    assert(text.linesIterator.exists(_.startsWith("| ")),
      "rendered report table must appear in the scripted output")
    assert(text.contains(s"Removed $outDir."))
    assert(text.contains("Goodbye!"))
    assert(!new java.io.File(outDir).exists())
  }

  test("out-of-order silver reports the error and the menu survives") {
    val outDir = java.nio.file.Files.createTempDirectory("cliErr").toString + "/none"
    val text = run("2\n9\n7\n", outDir)
    assert(text.contains("Error in silver"))
    assert(text.contains("Invalid choice. Please select 1-7."))
    assert(text.contains("Goodbye!"))
  }
}
