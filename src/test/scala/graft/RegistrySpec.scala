package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Registry integrity — the invariants the driver's correctness gate
  * silently assumes: the query and oracle maps stay in bijection (one
  * declared rows-only exception), no module shadows another's key, and
  * every key follows the qNN_snake_case convention. A dangling oracle (SQL
  * with no query) or an unoracled query landing unnoticed is exactly how a
  * surface regresses from "hash-gated" to "claimed". */
class RegistrySpec extends AnyFunSuite with Matchers {

  /** Queries that are deliberately rows-only (no DuckDB oracle). Empty
    * since round 16: q53 — the last holdout — now carries a pinned-flag
    * error-band oracle (q196-style), so the whole surface is hash-gated.
    * Honest footnote on "hash-gated": q53/q196 are ASSERTED-FLAG oracles —
    * their sketch-verdict flag columns are asserted constants, not replays;
    * their exact-value columns (counts, percentiles) are replayed. */
  private val declaredRowsOnly = Set.empty[String]

  test("every oracle belongs to a registered query") {
    (SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet) shouldBe empty
  }

  test("every query is oracled except the declared rows-only set") {
    (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet) shouldBe declaredRowsOnly
  }

  test("no module shadows another module's query or oracle key") {
    // flatMap(_.queries).toMap silently keeps the LAST binding on key
    // collision — assert there is nothing to keep silently
    val qKeys = SparkEntry.modules.flatMap(_.queries.keys)
    qKeys.diff(qKeys.distinct) shouldBe empty
    val oKeys = SparkEntry.modules.flatMap(_.oracles.keys)
    oKeys.diff(oKeys.distinct) shouldBe empty
  }

  test("every registered query id appears in SURVEY.md §8 (doc drift is a build failure)") {
    val survey = {
      val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
      try src.mkString finally src.close()
    }
    // a qNN mention anywhere counts, with or without the _snake suffix;
    // ranges like "q09–q23" / "q13-q15" expand to every number inside
    val mentioned = scala.collection.mutable.Set.empty[Int]
    "q([0-9]+)\\s*[–-]\\s*q([0-9]+)".r.findAllMatchIn(survey).foreach { m =>
      (m.group(1).toInt to m.group(2).toInt).foreach(mentioned += _)
    }
    "(?<![0-9a-zA-Z_])q([0-9]+)".r.findAllMatchIn(survey)
      .foreach(m => mentioned += m.group(1).toInt)
    val missing = SparkEntry.queries.keySet.filter { k =>
      !mentioned.contains(k.drop(1).takeWhile(_.isDigit).toInt)
    }
    withClue("SURVEY.md is missing rows for: ")(missing shouldBe empty)
  }

  test("keys follow the qNN_snake_case convention and numbers are unique") {
    val pat = "^q[0-9]+[a-z0-9_]*$".r
    SparkEntry.queries.keySet.foreach { k =>
      withClue(k)(pat.matches(k) shouldBe true)
    }
    val nums = SparkEntry.queries.keySet.toSeq.map(_.drop(1).takeWhile(_.isDigit))
    nums.diff(nums.distinct) shouldBe empty
  }
}
