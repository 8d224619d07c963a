package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Plan-shape and result-shape checks for the relational core. The oracle
  * gate covers values; these tests pin the *physical plans* we want at scale:
  * broadcast joins where a side is small, no cartesian products, pushed
  * filters. */
class RelationalSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("dimension joins broadcast (no shuffle of the fact side)") {
    plan("q09_join_broadcast") should include("BroadcastHashJoin")
    plan("q22_shipping_priority") should include("BroadcastHashJoin")
    plan("q23_local_supplier_volume") should include("BroadcastHashJoin")
  }

  test("no cartesian products or nested-loop joins in equi-join queries") {
    for (q <- Seq("q09_join_broadcast", "q10_join_agg", "q20_semi_join",
                  "q21_anti_join", "q22_shipping_priority", "q23_local_supplier_volume")) {
      val p = plan(q)
      p should not include "CartesianProduct"
      p should not include "BroadcastNestedLoopJoin"
    }
  }

  test("bucketed dedup/similarity pipelines never plan an all-pairs join") {
    for (q <- Seq("q35_ngram_jaccard", "q36_minhash_lsh",
                  "q47_embedding_neardup", "q58_simhash_hamming", "q62_range_join",
                  "q85_dup_spans", "q87_incremental_dedup", "q89_containment",
                  "q200_incremental_lsh")) {
      val p = plan(q)
      p should not include "CartesianProduct"
      p should not include "BroadcastNestedLoopJoin"
    }
  }

  test("the scoring/semantic tier cross-joins only broadcast scalars, never big sides") {
    // q98/q100/q102 broadcast 1-row totals and <=|vocab| model tables;
    // q99's centroid probe broadcasts k rows. Those legitimately plan
    // BroadcastNestedLoopJoin; what must NEVER appear is a non-broadcast
    // CartesianProduct (two big sides). q99's within-cluster pair search
    // must additionally survive as a cluster-keyed shuffled equi-join.
    for (q <- Seq("q97_cdc_chunks", "q98_bigram_logprob", "q99_semantic_dedup",
                  "q100_dsir_weights", "q101_temperature_mix", "q102_nb_langid")) {
      plan(q) should not include "CartesianProduct"
    }
    val p99 = plan("q99_semantic_dedup")
    (p99.contains("SortMergeJoin") || p99.contains("ShuffledHashJoin")) shouldBe true
    // q97 is pure row-local map work + one stats aggregation: no join at all
    plan("q97_cdc_chunks") should not include "Join"
  }

  test("scan-level filter pushdown and column pruning reach the parquet reader") {
    val p = plan("q03_predicate_filter")
    p should include("PushedFilters")
    p should include("GreaterThan(l_quantity")
    // projection prunes to the 4 selected columns
    p should include("ReadSchema")
    p should not include "l_returnflag"
  }

  test("dedup payload pruning narrows the q01 scan to consumed columns") {
    // the min(struct) survivor is decided inside the total-order tiebreak,
    // so the unconsumed payload columns must not survive into the scan
    val p = plan("q01_medallion_gold")
    p should include("ReadSchema")
    for (dropped <- Seq("l_shipdate", "l_linestatus", "l_discount", "l_tax"))
      p should not include dropped
    p should include("l_returnflag") // the one consumed payload column stays
  }

  test("top-k plans as a bounded sort, not a global sort") {
    plan("q12_topk_orders") should include("TakeOrderedAndProject")
  }

  test("grouping sets plan as one Expand pass, not three scans") {
    for (q <- Seq("q59_grouping_sets", "q93_corpus_datasheet")) {
      val p = plan(q)
      p should include("Expand")
      "FileScan".r.findAllIn(p).size shouldBe 1
    }
  }

  test("full outer join plans as a sort-merge join with both sides shuffled once") {
    val p = plan("q60_full_outer")
    p should include("SortMergeJoin")
    p should include("FullOuter")
  }

  test("the curation composite stays a two-shuffle pipeline (plus the final sort)") {
    // fingerprint groupBy + language groupBy + output orderBy = at most 3
    // exchanges; anything more means a stage re-reads or re-partitions
    val p = plan("q61_corpus_curation")
    "Exchange".r.findAllIn(p).size should be <= 3
    "FileScan".r.findAllIn(p).size shouldBe 1
  }

  test("containment rides q35's single-shingling-pass posting-list pipeline") {
    // The underlying pair pipeline: one corpus scan (the posting list
    // carries both set sizes, so no join back to a recomputed shingle
    // table) and two shuffles: posting-list groupBy + pair-counts groupBy.
    val d = graft.sources.Tables.read(spark, sf0001, "documents")
    val pipe = graft.operators.Dedup.ngramContainmentPairsFrom(d)
      .queryExecution.executedPlan.toString
    "FileScan".r.findAllIn(pipe).size shouldBe 1
    "Exchange".r.findAllIn(pipe).size should be <= 2
    // The registered q89 is a scalar projection over the MATERIALIZED
    // shared pair-count layer (the same frame q35/q141/q76... read): no
    // fresh corpus scan at all, and the top-20 output is a bounded sort.
    val p = plan("q89_containment")
    "FileScan".r.findAllIn(p).size shouldBe 0
    p should include("TakeOrderedAndProject")
  }

  test("q85's duplicated-span scan shuffles hashes, never text") {
    // two corpus scans by design (the duplicated-hash set derives from its
    // own aggregation pass — the alternative, collect_list posting buffers,
    // is unbounded per hot span); every exchange carries only (doc_id, h)
    // or aggregated counts
    val p = plan("q85_dup_spans")
    "FileScan".r.findAllIn(p).size shouldBe 2
    // both passes prune the 5-column documents scan to the 2 consumed columns
    "ReadSchema: struct<doc_id:bigint,text:string>".r
      .findAllIn(p).size shouldBe 2
  }

  test("q36's candidate pipeline is computed once and reused (materialized layer)") {
    // minhashLshPairs references the candidate set from several legs
    // (semi-join filter + two candDocs legs + two pair legs). Candidates
    // now come from the session-materialized CANDIDATE silver layer
    // (Dedup.sharedMinhashCandidates — shared with q145's audit), so the
    // banded signature pipeline never recomputes per leg: every reference
    // is a scan of the checkpointed rows, and the only corpus FileScan
    // left is the candidates-only verification shingling pass.
    val df = SparkEntry.queries("q36_minhash_lsh")(spark, sf0001)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    val finalPlan = full.split("== Initial Plan ==").head
    finalPlan should include("Scan ExistingRDD")
    withClue("corpus re-scan count in the final plan:\n") {
      "FileScan".r.findAllIn(finalPlan).size should be <= 1
    }
  }

  test("semi/anti joins never duplicate left rows") {
    val c = SparkEntry.queries("q20_semi_join")(spark, sf0001).count() +
            SparkEntry.queries("q21_anti_join")(spark, sf0001).count()
    val total = graft.sources.Tables.read(spark, sf0001, "customer").count()
    c shouldBe total // semi + anti partition the customer set
  }

  test("sketch aggregates land within tolerance of their exact companions") {
    val rows = SparkEntry.queries("q53_sketch_stats")(spark, sf0001).collect()
    rows should not be empty
    rows.foreach { r =>
      withClue(r) {
        r.getAs[Long]("hll_ok") shouldBe 1L
        r.getAs[Long]("p25_ok") shouldBe 1L
        r.getAs[Long]("p75_ok") shouldBe 1L
      }
    }
    // the tighter 5% HLL assertion on the raw sketch values (q53's emitted
    // flags use the looser driver-gate band)
    import org.apache.spark.sql.functions.{approx_count_distinct, countDistinct, col}
    val li = graft.sources.Tables.read(spark, sf0001, "lineitem")
    val a = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("e"),
        approx_count_distinct(col("l_partkey")).as("a")).collect()
    a.foreach { r =>
      val (e, ap) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      math.abs(ap - e) / e should be <= 0.05 // HLL++ default rsd 5%
    }
  }

  test("window rank returns at most k rows per partition key") {
    val rows = SparkEntry.queries("q16_window_rank")(spark, sf0001).collect()
    rows.groupBy(_.getString(0)).values.foreach(_.length should be <= 5)
    rows.foreach(_.getLong(1) should be <= 5L)
  }

  test("equi-depth histogram: 8 buckets, balanced populations, ordered disjoint ranges") {
    val rows = SparkEntry.queries("q112_equidepth_hist")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    rows.map(_._1) shouldBe (1L to 8L).toArray
    val sizes = rows.map(_._2)
    (sizes.max - sizes.min) should be <= 1L   // the ntile population guarantee
    rows.foreach { case (_, _, lo, hi) => lo should be <= hi }
    rows.sliding(2).foreach { case Array(a, b) => a._4 should be <= b._3 case _ => }
  }

  test("rolling 7-day actives dominate daily actives and cap at the user universe") {
    val rolling = SparkEntry.queries("q119_rolling_active")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val daily = graft.sources.Tables.read(spark, sf0001, "events")
      .select(floor(col("ts").cast("long") / 86400L).cast("long").as("day"), col("user_id"))
      .distinct().groupBy(col("day")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val universe = graft.sources.Tables.read(spark, sf0001, "events")
      .select("user_id").distinct().count()
    rolling.keySet should contain allElementsOf daily.keySet
    daily.foreach { case (d, n) =>
      rolling(d) should be >= n          // window includes the day itself
      rolling(d) should be <= universe   // never exceeds the user universe
    }
  }

  test("column profile: per-column cardinalities and counts line up with the table") {
    val rows = SparkEntry.queries("q120_column_profile")(spark, sf0001).collect()
    rows.map(_.getString(0)).sorted shouldBe Array(
      "c_acctbal", "c_custkey", "c_mktsegment", "c_name", "c_nationkey")
    val nRows = graft.sources.Tables.read(spark, sf0001, "customer").count()
    rows.foreach { r =>
      r.getLong(1) shouldBe nRows                       // n_rows
      (r.getLong(2) + r.getLong(3)) should be >= 1L     // nulls + distinct nonzero
      r.getLong(3) should be <= nRows                   // n_distinct bounded
      r.getString(4) should be <= r.getString(5)        // min <= max
    }
    // the key column is unique: distinct count equals the row count
    rows.find(_.getString(0) == "c_custkey").get.getLong(3) shouldBe nRows
  }

  test("pareto shares sum to one and cumulate monotonically to exactly 1.0") {
    val rows = SparkEntry.queries("q130_pareto_share")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    val cums = rows.map(_._3)
    cums.zip(cums.tail).foreach { case (a, b) => b should be >= a }
    cums.last shouldBe 1.0 +- 1e-6
    rows.map(_._2).sum shouldBe 1.0 +- 1e-4   // per-row rounding tolerance
  }

  test("IVM state merge equals the from-scratch aggregate (monoid proof)") {
    val merged = SparkEntry.queries("q121_ivm_merge")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val scratch = graft.sources.Tables.read(spark, sf0001, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("t"))
      .orderBy(col("o_orderpriority")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    merged shouldBe scratch
  }

  test("winsorized mean sits inside the fences and keeps every row") {
    val rows = SparkEntry.queries("q122_winsorized_mean")(spark, sf0001).collect()
    val fences = graft.sources.Tables.read(spark, sf0001, "events")
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.05)").as("lo"), expr("percentile(value, 0.95)").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val counts = graft.sources.Tables.read(spark, sf0001, "events")
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (lo, hi) = fences(r.getString(0))
      r.getLong(1) shouldBe counts(r.getString(0))      // winsorizing drops nothing
      r.getDouble(3) should (be >= lo - 1e-6 and be <= hi + 1e-6)
    }
  }

  test("poisson-bootstrap CI brackets the true mean with ordered bounds") {
    val r = SparkEntry.queries("q131_bootstrap_ci")(spark, sf0001).head()
    val (lo, mid, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    lo should be <= mid
    mid should be <= hi
    val trueMean = graft.sources.Tables.read(spark, sf0001, "events")
      .agg(avg(col("value"))).head().getDouble(0)
    // deterministic fixture + deterministic weights → a stable containment
    trueMean should (be >= lo and be <= hi)
  }

  test("time-decayed engagement preserves event counts and is bounded by undecayed mass") {
    val rows = SparkEntry.queries("q110_time_decay")(spark, sf0001).collect()
    val raw = graft.sources.Tables.read(spark, sf0001, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(abs(col("value"))).as("mass"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (n, mass) = raw(r.getString(0))
      r.getLong(1) shouldBe n                      // decay never drops events
      math.abs(r.getDouble(2)) should be <= mass + 1e-6 // |weights| <= 1
    }
  }
}
