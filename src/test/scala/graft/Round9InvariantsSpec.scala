package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Structural invariants of the round-9 operators — properties the value
  * oracle cannot state (it replays the same formula; these assert the
  * formula's meaning): conservation, monotonicity, stochasticity, and
  * consistency between a report and the frames it summarizes. All on the
  * sf0.001 fixture via the registered query functions, so they guard the
  * exact surface the driver runs. */
class Round9InvariantsSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  private def q(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("q158: exact percentile values are non-decreasing in pct") {
    val rows = q("q158_exact_percentiles").orderBy(col("pct")).collect()
    rows.length shouldBe 5
    val vals = rows.map(_.getAs[Double]("value"))
    vals.sliding(2).foreach { case Array(a, b) => a should be <= b }
  }

  test("q160: interval merge conserves events and bounds coverage") {
    val events = graft.sources.Tables.read(spark, sf0001, "events")
    val perUser = events.groupBy(col("user_id")).agg(count(lit(1)).as("ne"))
    val merged = q("q160_interval_merge")
    // island count never exceeds event count; coverage is at least one
    // interval's 600 s and at most n_events * 600 s (merging only shrinks)
    val joined = merged.join(perUser, "user_id").collect()
    joined.length should be > 0
    joined.foreach { r =>
      val n = r.getAs[Long]("n_intervals"); val ne = r.getAs[Long]("ne")
      val cov = r.getAs[Long]("coverage_s"); val longest = r.getAs[Long]("longest_s")
      n should be <= ne
      cov should be >= 600L
      cov should be <= ne * 600L
      longest should be <= cov
      longest should be >= 600L
    }
  }

  test("q165: the 1/2/3-step matrices are row-stochastic") {
    val m = q("q165_markov_power")
    for (c <- Seq("p1", "p2", "p3")) {
      val sums = m.groupBy(col("from_type"))
        .agg(sum(col(c)).as("s")).collect()
      sums.foreach(r => r.getAs[Double]("s") shouldBe 1.0 +- 1e-4)
    }
  }

  test("q166: attribution conserves one credit unit per attributed purchase") {
    val events = graft.sources.Tables.read(spark, sf0001, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("t"))
    val pur = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), col("t").as("pt"))
    val attributed = pur.join(events, Seq("user_id"))
      .filter(col("t") >= col("pt") - 86400L && col("t") < col("pt"))
      .select(col("pid")).distinct().count()
    val totalCredit = q("q166_multitouch").agg(sum(col("credit"))).head().getDouble(0)
    totalCredit shouldBe attributed.toDouble +- 1e-3
  }

  test("q168: padding report conserves the corpus token count") {
    val docs = graft.sources.Tables.read(spark, sf0001, "documents")
    val directTokens = docs
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim(col("text")), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    val report = q("q168_padding_waste").collect()
    assert(report.map(_.getAs[Long]("total_tokens")).sum == directTokens)
    assert(report.map(_.getAs[Long]("n_docs")).sum == docs.count())
    report.foreach { r =>
      r.getAs[Double]("pad_ratio") should (be >= 0.0 and be <= 1.0)
    }
  }

  test("q169: confusion matrix partitions the corpus and predictions cover labels") {
    val conf = q("q169_centroid_confusion").collect()
    conf.map(_.getAs[Long]("n")).sum shouldBe
      graft.sources.Tables.read(spark, sf0001, "embeddings").count()
    conf.foreach(r => r.getAs[Long]("n") should be > 0L)
  }

  test("q164: the gate row is consistent with the reports it summarizes") {
    val gate = q("q164_release_gate").head()
    val nRules = gate.getAs[Long]("n_rules")
    val nPassed = gate.getAs[Long]("n_passed")
    val expectationRows = q("q154_data_expectations").collect()
    nRules shouldBe expectationRows.length.toLong
    nPassed shouldBe expectationRows.map(_.getAs[Long]("passed")).sum
    val open = gate.getAs[Long]("gate")
    val expected =
      if (nPassed == nRules &&
        gate.getAs[Long]("silver_rows").toDouble >= gate.getAs[Long]("bronze_rows") * 0.95) 1L
      else 0L
    open shouldBe expected
  }

  test("q163: dp noise is bounded for the released groups and reproducible") {
    val a = q("q163_dp_counts").collect()
    val b = q("q163_dp_counts").collect()
    a.map(_.toString) shouldBe b.map(_.toString) // seeded => identical release
    a.foreach { r =>
      math.abs(r.getAs[Double]("noise")) should be < 25.0 // |Laplace(1)| < 25 w.p. 1-2e-11
      r.getAs[Long]("dp_count") shouldBe
        math.round(r.getAs[Long]("true_n") + r.getAs[Double]("noise"))
    }
  }
}
