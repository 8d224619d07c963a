package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Build-time plan audit over the WHOLE query surface (planning only — no
  * query executes, so the full sweep stays cheap). The oracle gate covers
  * values; this pins the scale-hazard inventory: every unpartitioned window
  * (`Sort` over `Exchange SinglePartition` — a single-node sort of its input
  * frame) must be classified in [[ExplainAudit.SinglePartitionAllowlist]],
  * so a new exact-mode window cannot land unreviewed. */
class AuditSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  test("every single-partition window sort is classified in the allowlist") {
    val flagged = ExplainAudit.singlePartitionWindows(spark, sf0001).map(_._1).toSet
    val known = ExplainAudit.SinglePartitionAllowlist.keySet
    withClue("unclassified single-partition window plans (document in " +
      "ExplainAudit.SinglePartitionAllowlist or repartition the window):\n") {
      (flagged -- known) shouldBe empty
    }
    withClue("allowlist entries whose plan no longer has a single-partition " +
      "window (stale — remove them):\n") {
      (known -- flagged) shouldBe empty
    }
  }
}
