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

  /** Queries that are deliberately rows-only (no DuckDB oracle), each with
    * its compensating gate documented in SparkEntry.oracleSql's scaladoc. */
  private val declaredRowsOnly = Set("q53_sketch_stats")

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

  test("keys follow the qNN_snake_case convention and numbers are unique") {
    val pat = "^q[0-9]+[a-z0-9_]*$".r
    SparkEntry.queries.keySet.foreach { k =>
      withClue(k)(pat.matches(k) shouldBe true)
    }
    val nums = SparkEntry.queries.keySet.toSeq.map(_.drop(1).takeWhile(_.isDigit))
    nums.diff(nums.distinct) shouldBe empty
  }
}
