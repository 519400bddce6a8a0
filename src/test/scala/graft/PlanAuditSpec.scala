package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guard for the physical-plan artifact: `docs/PLANS.txt` (regenerated
  * via `sbt "runMain graft.tools.ExplainAudit" > docs/PLANS.txt`) must
  * hold a captured plan for EVERY key in SparkEntry.queries. Round 3
  * shipped two queries whose plans were never captured because nothing
  * asserted the artifact tracks the catalog — this spec makes that
  * drift a test failure instead of a silent gap. */
class PlanAuditSpec extends AnyFunSuite {

  test("docs/PLANS.txt holds a plan for every query in the catalog") {
    val path = java.nio.file.Paths.get("docs/PLANS.txt")
    assert(java.nio.file.Files.exists(path), "docs/PLANS.txt missing")
    val text = java.nio.file.Files.readString(path)
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(n => text.contains(s"===================== $n ====================="))
    assert(missing.isEmpty,
      s"docs/PLANS.txt lags the query catalog — regenerate with " +
        s"`sbt \"runMain graft.tools.ExplainAudit\" > docs/PLANS.txt`; missing: $missing")
  }
}
