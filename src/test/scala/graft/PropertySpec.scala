package graft

import graft.operators.Medallion
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest, Prop}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** ScalaCheck properties over the medallion stages (SURVEY.md §5.3), driven
  * through small generated DataFrames. */
class PropertySpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private val rowGen = for {
    id <- Gen.option(Gen.choose(0, 20).map(_.toString))
    v <- Gen.choose(0.0, 200.0)
    grp <- Gen.oneOf("micro", "nano", "brewpub")
  } yield (id, v, grp)

  private val dataGen = Gen.listOfN(60, rowGen)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    withClue(res.status.toString)(res.passed shouldBe true)
  }

  test("dedup is idempotent and keeps one row per key") {
    check(Prop.forAll(dataGen) { data =>
      val df = data.toDF("id", "value", "grp").filter($"id".isNotNull)
      val once = Medallion.dedupByKey("id", $"value", $"grp")(df)
      val twice = Medallion.dedupByKey("id", $"value", $"grp")(once)
      val keys = df.select("id").distinct().count()
      once.count() == keys && twice.collect().toSet == once.collect().toSet
    })
  }

  test("null filter output is a subset of input; filtered rows all non-null") {
    check(Prop.forAll(dataGen) { data =>
      val df = data.toDF("id", "value", "grp")
      val out = Medallion.requireField("id")(df)
      out.count() <= df.count() && out.filter($"id".isNull).count() == 0
    })
  }

  test("gold group counts total the silver row count") {
    check(Prop.forAll(dataGen) { data =>
      val df = data.toDF("id", "value", "grp").filter($"id".isNotNull)
      val silver = Medallion.withStatus("value")(
        Medallion.dedupByKey("id", $"value", $"grp")(df))
      val gold = Medallion.goldRollup("grp", "status")(silver)
      gold.agg(coalesce(sum("n_rows"), lit(0L))).head().getLong(0) == silver.count()
    })
  }

  test("status column is exhaustive and matches the threshold rule") {
    check(Prop.forAll(dataGen) { data =>
      val df = data.toDF("id", "value", "grp")
      val out = Medallion.withStatus("value")(df)
      out.filter(!($"status" === "High" || $"status" === "Low")).count() == 0 &&
        out.filter($"value" > 100 && $"status" =!= "High").count() == 0 &&
        out.filter($"value" <= 100 && $"status" =!= "Low").count() == 0
    })
  }
}
