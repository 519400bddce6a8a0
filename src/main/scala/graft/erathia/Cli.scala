package graft.erathia

import java.io.{BufferedReader, PrintStream}
import org.apache.spark.sql.SparkSession

/** Interactive CLI entry loop — the user-facing orchestration surface of
  * the reference (main.py:349-386 menu, :100-121 volume-estimate
  * prompt), re-expressed over the Spark pipeline stages. Stage handlers
  * report errors per step and return to the menu (the reference's
  * try/except-per-stage behavior) instead of tearing the session down.
  *
  * The loop is written against injected reader/writer streams so
  * CliSpec can drive a full scripted session; `main` binds stdin/stdout.
  *
  * Usage: runMain graft.erathia.Cli [outDir]
  */
object Cli {

  /** Trades per simulated week (DataGen's generator density — the same
    * constant the reference derives as 300 agents × 50% shopping × 0.7
    * conversion, main.py:111-117). */
  val TradesPerWeek = 105

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/erathia")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("erathia-cli")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try loop(spark, outDir,
      new BufferedReader(new java.io.InputStreamReader(System.in)), System.out)
    finally spark.stop()
  }

  /** Weeks prompt with the reference's volume estimate; re-asks on bad
    * input, empty input takes the default. */
  def promptWeeks(in: BufferedReader, out: PrintStream, default: Int = 104): Int = {
    while (true) {
      out.print(s"  > How many weeks to simulate? (default: $default): ")
      out.flush()
      val line = Option(in.readLine()).map(_.trim).getOrElse("")
      val parsed =
        if (line.isEmpty) Some(default)
        else line.toIntOption
      parsed match {
        case None => out.println("  Error: Please enter a valid integer.")
        case Some(w) if w <= 0 =>
          out.println("  Error: Number of weeks must be positive.")
        case Some(w) =>
          out.println(s"  OK. Simulating $w weeks.")
          out.println(f"  Estimated transactions: ~${w.toLong * TradesPerWeek}%,d rows.")
          return w
      }
    }
    0 // unreachable
  }

  private def step(out: PrintStream, name: String)(body: => Unit): Unit =
    try {
      body
      out.println(s"  $name: done.")
    } catch {
      case e: Exception => out.println(s"  Error in $name: ${e.getMessage}")
    }

  /** The main menu loop (reference main.py:349-386). */
  def loop(s: SparkSession, outDir: String,
      in: BufferedReader, out: PrintStream): Unit = {
    out.println("========================================")
    out.println("   Erathia Marketplace Engine (Spark)   ")
    out.println("========================================")
    var running = true
    while (running) {
      out.println()
      out.println("Select an option:")
      out.println("  1. Step 1: Generate Bronze Layer")
      out.println("  2. Step 2: Process Silver Layer")
      out.println("  3. Step 3: Aggregate Gold Layer")
      out.println("  4. Run Full Pipeline (Steps 1-3)")
      out.println("  5. View Gold Layer Reports")
      out.println("  6. Clean All Data")
      out.println("  7. Exit")
      out.print("Choice [1-7]: ")
      out.flush()
      Option(in.readLine()).map(_.trim) match {
        case None | Some("7") =>
          out.println("Goodbye!")
          running = false
        case Some("1") =>
          val weeks = promptWeeks(in, out)
          step(out, "bronze") { DataGen.writeBronze(s, s"$outDir/bronze", weeks) }
        case Some("2") =>
          step(out, "silver") {
            val n = Silver.run(s, s"$outDir/bronze", s"$outDir/silver")
            out.println(s"  Cleaned fact rows: $n")
          }
        case Some("3") =>
          step(out, "gold") {
            // a fresh session has no temp views: re-register the silver
            // layer from disk so step 3 works across CLI restarts (the
            // reference gets this from its persistent DuckDB file)
            if (!s.catalog.tableExists("fact_sales"))
              Silver.registerFromDisk(s, s"$outDir/silver")
            Gold.run(s, s"$outDir/gold")
          }
        case Some("4") =>
          val weeks = promptWeeks(in, out)
          step(out, "full pipeline") {
            DataGen.writeBronze(s, s"$outDir/bronze", weeks)
            val n = Silver.run(s, s"$outDir/bronze", s"$outDir/silver")
            Gold.run(s, s"$outDir/gold")
            out.println(s"  Cleaned fact rows: $n")
          }
        case Some("5") => viewReports(s, in, out)
        case Some("6") =>
          step(out, "clean") {
            val dir = new java.io.File(outDir)
            def rm(f: java.io.File): Unit = {
              if (f.isDirectory) f.listFiles().foreach(rm)
              f.delete(): Unit
            }
            if (dir.exists()) rm(dir)
            out.println(s"  Removed $outDir.")
          }
        case Some(other) =>
          out.println(s"Invalid choice. Please select 1-7.")
      }
    }
  }

  /** Plain-text table rendering for the injected output stream —
    * DataFrame.show() prints to the real stdout, which a scripted
    * session could neither capture nor redirect. */
  private[erathia] def render(df: org.apache.spark.sql.DataFrame, n: Int): String = {
    val header = df.columns.toSeq
    val rows = df.limit(n).collect().toSeq
      .map(_.toSeq.map(v => if (v == null) "null" else v.toString))
    val widths = (header +: rows).transpose.map(_.map(_.length).max)
    def line(vals: Seq[String]) =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString("| ", " | ", " |")
    (line(header) +: rows.map(line)).mkString("\n")
  }

  /** Reports submenu: list marts, show the chosen one, 'Q' to return
    * (reference main.py:300-347 view loop + price drill-down). */
  def viewReports(s: SparkSession, in: BufferedReader, out: PrintStream): Unit = {
    val marts = Viewer.listMarts(s)
    if (marts.isEmpty) {
      out.println("  No gold marts found. Run Step 3 first.")
      return
    }
    var viewing = true
    while (viewing) {
      out.println("\nAvailable reports:")
      marts.zipWithIndex.foreach { case (m, i) => out.println(s"  ${i + 1}. $m") }
      out.print(s"Report [1-${marts.length}] or Q: ")
      out.flush()
      Option(in.readLine()).map(_.trim.toUpperCase) match {
        case None | Some("Q") => viewing = false
        case Some(numStr) =>
          numStr.toIntOption match {
            case Some(i) if i >= 1 && i <= marts.length =>
              val mart = marts(i - 1)
              step(out, s"report $mart") {
                out.println(s"== $mart")
                out.println(render(Viewer.report(s, mart), 20))
              }
            case _ =>
              out.println(
                s"  Error: Invalid choice. Please enter a number between 1 and ${marts.length}.")
          }
      }
    }
  }
}
