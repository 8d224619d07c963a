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

  test("hamming retrieval equals brute force on random corpora (pigeonhole)") {
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val docGen = Gen.chooseNum(5, 12).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    val corpusGen = Gen.listOfN(25, docGen)
    check(Prop.forAll(corpusGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val sigs = df.select($"doc_id", graft.operators.Dedup.simhash64.as("sh"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      val truth = (for {
        i <- sigs.indices; j <- (i + 1) until sigs.length
        d = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) if d <= 3
      } yield (math.min(sigs(i)._1, sigs(j)._1), math.max(sigs(i)._1, sigs(j)._1), d.toLong)).toSet
      val got = graft.operators.Dedup.simhashHammingPairsFrom(df)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      got == truth
    })
  }

  test("df-cap only removes pairs, never adds or changes surviving similarities") {
    val wordGen = Gen.oneOf("a1", "b2", "c3", "d4", "e5", "f6", "g7", "h8", "i9", "j0")
    val docGen = Gen.chooseNum(6, 14).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    val corpusGen = Gen.listOfN(18, docGen)
    check(Prop.forAll(corpusGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def pairs(cap: Int) = graft.operators.Dedup.ngramJaccardPairsFrom(df, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val uncapped = pairs(Int.MaxValue)
      val capped = pairs(4)
      // capped pair set is a subset, and a pair's jaccard can only shrink
      capped.forall { case (k, j) => uncapped.contains(k) && j <= uncapped(k) }
    })
  }

  test("triangle census is invariant to edge orientation, duplication, and self-loops") {
    val edgeGen = for {
      a <- Gen.choose(1L, 12L); b <- Gen.choose(1L, 12L)
    } yield (a, b)
    val graphGen = Gen.listOfN(30, edgeGen)
    check(Prop.forAll(graphGen) { edges =>
      val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b }.distinct
      val noisy = edges ++ edges.map { case (a, b) => (b, a) } // dup + reversed
      def census(e: Seq[(Long, Long)]) =
        graft.operators.Cluster.triangleCensus(e.toDF("u", "v")).head()
      val c1 = census(canon)
      val c2 = census(noisy)
      (0 to 2).forall(i => c1.getLong(i) == c2.getLong(i)) &&
        c1.getDouble(3) == c2.getDouble(3)
    })
  }

  test("heavy hitters equal the exact threshold group-by for any corpus and small k") {
    val wordGen = Gen.frequency(6 -> Gen.const("hot"), 3 -> Gen.const("warm"),
      4 -> Gen.oneOf((1 to 30).map(i => s"cold$i")))
    val docGen = Gen.chooseNum(5, 15).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    val corpusGen = Gen.listOfN(12, docGen)
    check(Prop.forAll(corpusGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.operators.Tokenizer.heavyHitters(df, support = 0.1, k = 16)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val toks = df.select(explode(split(trim($"text"), " ")).as("term"))
      val total = toks.count()
      val exact = toks.groupBy("term").count()
        .filter($"count" >= total * 0.1).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      got == exact
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
