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

  test("q181: cluster-keyed split partitions the corpus and leaks nothing") {
    val r = q("q181_cluster_safe_split").head()
    val total = graft.sources.Tables.read(spark, sf0001, "documents").count()
    (r.getAs[Long]("n_train_docs") + r.getAs[Long]("n_val_docs")
      + r.getAs[Long]("n_test_docs")) shouldBe total
    r.getAs[Long]("n_cross_split_pairs") shouldBe 0L
  }

  test("q182: the canonical survivor is its cluster's longest member") {
    val docs = graft.sources.Tables.read(spark, sf0001, "documents")
    val toks = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim(col("text")), " ")).cast("long").as("nt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val members = graft.operators.Cluster.dedupClusters(spark, sf0001)
      .select(col("cluster_id"), col("doc_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val rows = q("q182_canonical_selection").collect()
    rows.length should be > 0
    rows.foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      val surv = r.getAs[Long]("survivor_id")
      members(cid) should contain(surv)
      r.getAs[Long]("n_members").toInt shouldBe members(cid).size
      r.getAs[Long]("survivor_toks") shouldBe members(cid).map(toks).max
    }
  }

  test("q174: each flag reports exactly three distinct top quantity levels") {
    val rows = q("q174_topk_with_ties").collect()
    rows.groupBy(_.getAs[String]("l_returnflag")).foreach { case (_, rs) =>
      rs.map(_.getAs[Long]("dr")).sorted.toSeq shouldBe Seq(1L, 2L, 3L)
      rs.map(_.getAs[Double]("l_quantity")).distinct.length shouldBe 3
    }
  }

  test("q175: the weighted median lies inside each flag's price range") {
    val li = graft.sources.Tables.read(spark, sf0001, "lineitem")
    val ranges = li.groupBy(col("l_returnflag"))
      .agg(min(col("l_extendedprice")).as("lo"), max(col("l_extendedprice")).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    q("q175_weighted_median").collect().foreach { r =>
      val (lo, hi) = ranges(r.getAs[String]("l_returnflag"))
      val m = r.getAs[Double]("weighted_median")
      m should (be >= lo and be <= hi)
    }
  }

  test("q177: gini coefficients are valid inequality measures") {
    q("q177_gini_concentration").collect().foreach { r =>
      r.getAs[Double]("gini") should (be >= 0.0 and be < 1.0)
      r.getAs[Long]("n_customers") should be > 0L
    }
  }

  test("q176: pair counts are n-choose-2 of each type's observed days") {
    val days = graft.sources.Tables.read(spark, sf0001, "events")
      .select(col("event_type"),
        org.apache.spark.sql.functions.floor(col("ts").cast("long") / 86400L).as("d"))
      .distinct().groupBy(col("event_type")).agg(count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q("q176_theil_sen").collect().foreach { r =>
      val nd = days(r.getAs[String]("event_type"))
      r.getAs[Long]("n_pairs") shouldBe nd * (nd - 1) / 2
    }
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

  test("q205: conformal tau is the k-th smallest calibration score and rows cohere") {
    val rows = q("q205_conformal_gate").collect()
    rows.length should be > 0
    // every row pins the SAME tau
    val taus = rows.map(_.getAs[Double]("tau")).distinct
    taus.length shouldBe 1
    // tau recomputed independently: k-th smallest calibration quality score,
    // k = floor(alpha * (n_cal + 1)), alpha = 0.1
    val cal = graft.sources.Tables.read(spark, sf0001, "documents")
      .filter(col("doc_id") % 7 === 0)
      .select(graft.operators.TextAnalytics.qualityScore.as("q"))
      .collect().map(_.getDouble(0)).sorted
    val k = math.floor(0.1 * (cal.length + 1)).toInt
    taus.head shouldBe cal(k - 1)
    rows.foreach { r =>
      val (n, adm) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_admitted"))
      adm should be <= n
      r.getAs[Double]("admit_rate") shouldBe
        BigDecimal(adm.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // split-conformal coverage: overall admission ≈ 1 - alpha by construction
    // (exact guarantee is in expectation; the fixture draw must sit well
    // above the naive half, or the order statistic is wired backwards)
    val admitRate = rows.map(_.getAs[Long]("n_admitted")).sum.toDouble /
      rows.map(_.getAs[Long]("n_docs")).sum
    admitRate should be >= 0.7
  }

  test("q215: prefix source counts track the mixture weights within the stride bound") {
    val rows = q("q215_curriculum_interleave").orderBy(col("pos")).collect()
    rows.length shouldBe 100
    rows.map(_.getAs[Long]("pos")) shouldBe (1L to 100L).toArray
    // vtime is non-decreasing along the order
    rows.sliding(2).foreach { case Array(a, b) =>
      b.getAs[Double]("vtime") should be >= a.getAs[Double]("vtime")
    }
    // stride scheduling: by any virtual-time horizon T, source s has emitted
    // floor(T·w_s) docs — so prefix counts sit within ~1 of proportional
    val wt = graft.sources.Tables.read(spark, sf0001, "documents")
      .groupBy(col("source"))
      .agg(round(pow(sum(org.apache.spark.sql.functions.size(
        split(trim(col("text")), " "))).cast("double"), 0.7), 6).as("wt"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val tot = wt.values.sum
    val counts = rows.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    wt.foreach { case (src, w) =>
      val expected = 100.0 * w / tot
      math.abs(counts.getOrElse(src, 0) - expected) should be <= 2.0
    }
  }

  test("q225: KM survival is a proper non-increasing curve and matches the hand recurrence") {
    val rows = q("q225_km_survival").orderBy(col("day")).collect()
    rows.length should be > 0
    // survival in [0,1], non-increasing; n_risk non-increasing in day
    rows.sliding(2).filter(_.length == 2).foreach { p =>
      p(1).getAs[Double]("survival") should be <= p(0).getAs[Double]("survival") + 1e-9
      p(1).getAs[Long]("n_risk") should be <= p(0).getAs[Long]("n_risk")
    }
    // replay the product recurrence from the emitted (d, n) columns
    var s = 1.0
    rows.foreach { r =>
      s *= 1.0 - r.getAs[Long]("n_events").toDouble / r.getAs[Long]("n_risk")
      r.getAs[Double]("survival") shouldBe s +- 1e-4
    }
  }

  test("q236: drift matrix covers every (source, hash-batch) cell with bounded JS") {
    val rows = q("q236_source_batch_drift").collect()
    val nSrc = graft.sources.Tables.read(spark, sf0001, "documents")
      .select(col("source")).distinct().count().toInt
    rows.length shouldBe nSrc * 5
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      g.map(_.getAs[Long]("batch")).sorted shouldBe Array(0L, 1L, 2L, 3L, 4L)
    }
    rows.foreach { r =>
      val js = r.getAs[Double]("js_bits")
      js should (be >= -1e-6 and be <= 1.0 + 1e-6)
    }
    // hash batches are uniform samples of their source: sampling noise, not
    // systematic divergence — the mean sits far from the disjoint maximum
    val mean = rows.map(_.getAs[Double]("js_bits")).sum / rows.length
    mean should be < 0.5
  }

  test("q235: fertility >= 1 (BPE can only split words) and totals reconcile with q32") {
    val rows = q("q235_tokenizer_fertility").collect()
    rows.length should be > 0
    rows.foreach { r =>
      // every whitespace word yields >= 1 BPE-ish token on ASCII text
      r.getAs[Double]("fertility") should be >= 1.0
      r.getAs[Double]("bytes_per_token") should be > 0.0
    }
    val q32 = q("q32_token_count").collect()
    rows.map(_.getAs[Long]("ws_tokens")).sum shouldBe
      q32.map(_.getAs[Long]("n_ws_tokens")).sum
    rows.map(_.getAs[Long]("bpe_tokens")).sum shouldBe
      q32.map(_.getAs[Long]("n_bpe_tokens")).sum
  }

  test("q234: ROI tiers nest (exact ⊆ normalized) and near-dup totals match q218") {
    val rows = q("q234_dedup_roi").collect()
    val docs = graft.sources.Tables.read(spark, sf0001, "documents").count()
    rows.map(_.getAs[Long]("n_docs")).sum shouldBe docs
    rows.foreach { r =>
      // canonicalization only MERGES fingerprints: every raw-exact dup is
      // also a normalized dup (within a source this still holds globally,
      // but survivor identity could differ only if normalization merged the
      // raw survivor into an earlier cluster — which keeps it a dup)
      r.getAs[Long]("n_exact_dup") should be <= r.getAs[Long]("n_norm_dup")
      r.getAs[Long]("n_near_dup") should be <= r.getAs[Long]("n_docs")
    }
    val nearTotal = q("q218_softdedup_weights")
      .filter(col("cluster_size") >= 2 && col("doc_id") =!= col("cluster_id")).count()
    rows.map(_.getAs[Long]("n_near_dup")).sum shouldBe nearTotal
  }

  test("q233: per-arm KM curves are proper and their day-0 risk pools partition q225's") {
    val rows = q("q233_km_by_arm").orderBy(col("arm"), col("day")).collect()
    val arms = rows.map(_.getAs[Long]("arm")).distinct.sorted
    arms shouldBe Array(0L, 1L)
    arms.foreach { a =>
      val curve = rows.filter(_.getAs[Long]("arm") == a)
      curve.sliding(2).filter(_.length == 2).foreach { p =>
        p(1).getAs[Double]("survival") should be <= p(0).getAs[Double]("survival") + 1e-9
        p(1).getAs[Long]("n_risk") should be <= p(0).getAs[Long]("n_risk")
      }
      curve.foreach(_.getAs[Double]("survival") should (be >= 0.0 and be <= 1.0))
    }
    // the two arms' total conversions equal the pooled q225 total
    val pooled = q("q225_km_survival").collect().map(_.getAs[Long]("n_events")).sum
    rows.map(_.getAs[Long]("n_events")).sum shouldBe pooled
  }

  test("q232: Mahalanobis distances are positive, descending, and replay from raw moments") {
    val rows = q("q232_mahalanobis_outliers").collect()
    rows.length shouldBe 20
    rows.foreach(_.getAs[Double]("d2") should be > 0.0)
    rows.sliding(2).filter(_.length == 2).foreach { p =>
      p(1).getAs[Double]("d2") should be <= p(0).getAs[Double]("d2") + 1e-9
    }
    // replay the top row's distance from independently-computed moments
    val o = graft.sources.Tables.read(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_totalprice").cast("double").as("x1"))
      .join(graft.sources.Tables.read(spark, sf0001, "lineitem")
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).cast("double").as("x2")), Seq("o_orderkey"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val n = o.length.toDouble
    val (m1, m2) = (o.map(_._1).sum / n, o.map(_._2).sum / n)
    val v11 = o.map(p => (p._1 - m1) * (p._1 - m1)).sum / n
    val v22 = o.map(p => (p._2 - m2) * (p._2 - m2)).sum / n
    val v12 = o.map(p => (p._1 - m1) * (p._2 - m2)).sum / n
    val det = v11 * v22 - v12 * v12
    val top = rows.head
    val (x1, x2) = (top.getAs[Double]("totalprice"), top.getAs[Long]("n_lines").toDouble)
    val d2 = (v22 * (x1 - m1) * (x1 - m1) - 2 * v12 * (x1 - m1) * (x2 - m2)
      + v11 * (x2 - m2) * (x2 - m2)) / det
    top.getAs[Double]("d2") shouldBe d2 +- math.max(1e-3, d2 * 1e-3)
  }

  test("q231: Hill alphas are positive and reproduce the estimator on one source") {
    val rows = q("q231_hill_tail_index").collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getAs[Long]("k_used") shouldBe 15L
      Option(r.getAs[java.lang.Double]("alpha_hill"))
        .foreach(_.doubleValue should be > 0.0)
    }
    // hand-replay the estimator for the first source
    val src = rows.head.getString(0)
    val lens = graft.sources.Tables.read(spark, sf0001, "documents")
      .filter(col("source") === src)
      .select(org.apache.spark.sql.functions.size(split(trim(col("text")), " "))
        .cast("long").as("n"), col("doc_id"))
      .orderBy(col("n").desc, col("doc_id")).limit(16)
      .collect().map(_.getLong(0))
    val thr = lens.last.toDouble
    val slog = lens.take(15).map(x => math.log(x / thr)).sum
    rows.head.getAs[Double]("alpha_hill") shouldBe (15.0 / slog) +- 1e-3
  }

  test("q230: per-batch taus bracket the standing tau and drift is their exact difference") {
    val rows = q("q230_tau_stability").orderBy(col("batch")).collect()
    rows.length shouldBe 10
    val standing = rows.map(_.getAs[Double]("tau_standing")).distinct
    standing.length shouldBe 1
    rows.foreach { r =>
      r.getAs[Double]("tau_drift") shouldBe
        BigDecimal(r.getAs[Double]("tau_batch") - standing.head)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      r.getAs[Long]("n_cal") should be > 0L
    }
    // batches sample the same corpus: per-batch taus scatter AROUND the
    // standing threshold, not systematically on one side
    val drifts = rows.map(_.getAs[Double]("tau_drift"))
    drifts.count(_ > 0) should be >= 1
    drifts.count(_ < 0) should be >= 1
  }

  test("q229: buckets partition the corpus and dup totals reconcile with q218's cluster sizes") {
    val rows = q("q229_quality_dup_interaction").collect()
    val docs = graft.sources.Tables.read(spark, sf0001, "documents").count()
    rows.map(_.getAs[Long]("n_docs")).sum shouldBe docs
    rows.foreach { r =>
      r.getAs[Long]("bucket") should (be >= 0L and be <= 9L)
      r.getAs[Long]("n_dup") should be <= r.getAs[Long]("n_docs")
      r.getAs[Double]("dup_rate") should (be >= 0.0 and be <= 1.0)
    }
    // total duplicated docs == docs sitting in multi-member q218 clusters
    val multi = q("q218_softdedup_weights")
      .filter(col("cluster_size") >= 2).count()
    rows.map(_.getAs[Long]("n_dup")).sum shouldBe multi
  }

  test("q224: the A/A null experiment reads as null — small |z|, sane arms") {
    val rows = q("q224_ab_readout").orderBy(col("arm")).collect()
    rows.length shouldBe 2
    rows.map(_.getAs[Long]("arm")) shouldBe Array(0L, 1L)
    val users = graft.sources.Tables.read(spark, sf0001, "events")
      .select(col("user_id")).distinct().count()
    rows.map(_.getAs[Long]("n_users")).sum shouldBe users
    rows.foreach { r =>
      r.getAs[Long]("n_converted") should be <= r.getAs[Long]("n_users")
      r.getAs[Long]("n_users") should be > 0L // the hash actually splits
    }
    // there is NO treatment — both arms sample the same population, so a
    // large |z| would mean the assignment hash correlates with behavior
    val z = rows.head.getAs[Double]("z_stat")
    rows.map(_.getAs[Double]("z_stat")).distinct.length shouldBe 1
    math.abs(z) should be < 3.5
  }

  test("q222: every distinct fingerprint is admitted exactly once across the replay") {
    val rows = q("q222_dedup_pressure").orderBy(col("batch")).collect()
    rows.length shouldBe 10
    val d = graft.sources.Tables.read(spark, sf0001, "documents")
    rows.map(_.getAs[Long]("n_arrivals")).sum shouldBe d.count()
    val distinctFp = d.select(
      md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fp"))
      .distinct().count()
    rows.map(_.getAs[Long]("n_admitted")).sum shouldBe distinctFp
    rows.foreach { r =>
      r.getAs[Long]("n_admitted") should be <= r.getAs[Long]("n_arrivals")
      r.getAs[Double]("dup_rate") should (be >= 0.0 and be <= 1.0)
    }
  }

  test("q223: qualifying users only, flags cohere with CV, moments replay for one user") {
    val rows = q("q223_bot_regularity").collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getAs[Long]("n_events") should be >= 10L
      val cv = Option(r.getAs[java.lang.Double]("cv_gap")).map(_.doubleValue)
      (r.getAs[Long]("bot_flag") == 1L) shouldBe cv.exists(_ < 0.3)
    }
    // recompute one user's gap moments independently
    val u = rows.head.getAs[Long]("user_id")
    val ts = graft.sources.Tables.read(spark, sf0001, "events")
      .filter(col("user_id") === u)
      .orderBy(col("ts"), col("event_id"))
      .select(col("ts").cast("long")).collect().map(_.getLong(0))
    val gaps = ts.sliding(2).map(p => (p(1) - p(0)).toDouble).toArray
    val mean = gaps.sum / gaps.length
    rows.head.getAs[Double]("mean_gap_s") shouldBe mean +- 1e-4
  }

  test("q221: JS divergence is a bounded symmetric matrix over all source pairs") {
    val rows = q("q221_source_divergence").collect()
    val nSrc = graft.sources.Tables.read(spark, sf0001, "documents")
      .select(col("source")).distinct().count().toInt
    rows.length shouldBe nSrc * (nSrc - 1) / 2 // upper triangle, no diagonal
    rows.foreach { r =>
      r.getString(0) should be < r.getString(1)
      val js = r.getAs[Double]("js_bits")
      // JS in base 2 is bounded by [0, 1]; rounding may graze 0 from below
      js should (be >= -1e-6 and be <= 1.0 + 1e-6)
    }
    // same-vocabulary synthetic sources: divergence present but far from
    // the disjoint-support maximum
    val mean = rows.map(_.getAs[Double]("js_bits")).sum / rows.length
    mean should be < 0.5
  }

  test("q213: admission meets each source's target unless the source is exhausted") {
    val rows = q("q213_mixture_materialize").collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (nTot, nAdm) = (r.getAs[Long]("n_docs_total"), r.getAs[Long]("n_admitted"))
      val (tokAdm, target) = (r.getAs[Long]("tokens_admitted"), r.getAs[Long]("target_tokens"))
      nAdm should be <= nTot
      nAdm should be >= 1L // every target is positive, so the first doc always admits
      // the start-offset rule runs to (at least) the target, or runs out of docs
      assert(tokAdm >= target || nAdm == nTot,
        s"source ${r.getString(0)}: admitted $tokAdm of target $target with $nAdm/$nTot docs")
      r.getAs[Double]("realized_ratio") should be >= 0.0
    }
  }

  test("q214: one verdict per eval vector, flags cohere with the threshold, best_cos bounded") {
    val rows = q("q214_semantic_decontam").collect()
    val evalIds = graft.sources.Tables.read(spark, sf0001, "embeddings")
      .filter(col("vec_id") % 17 === 0).select(col("vec_id"))
      .collect().map(_.getLong(0)).sorted
    rows.map(_.getAs[Long]("eval_id")).sorted shouldBe evalIds
    rows.foreach { r =>
      r.getAs[Long]("corpus_id") % 17 should not be 0L // matched against the corpus only
      val cos = r.getAs[Double]("best_cos")
      cos should (be >= -1.0 and be <= 1.0)
      (r.getAs[Long]("contaminated") == 1L) shouldBe (cos >= 0.5)
    }
  }

  test("q212: the stream gate's tau equals q205's, and every verdict follows the predicate") {
    val stream = q("q212_stream_conformal").collect()
    stream.length should be > 0
    val tauStream = stream.map(_.getAs[Double]("tau")).distinct
    tauStream.length shouldBe 1
    val tauBatch = q("q205_conformal_gate").collect().map(_.getAs[Double]("tau")).distinct
    tauStream shouldBe tauBatch // one threshold, batch-trained, stream-served
    stream.foreach { r =>
      val admitted = r.getAs[Long]("admitted") == 1L
      admitted shouldBe (r.getAs[Double]("quality") >= tauStream.head)
    }
    // arrivals are exactly the staged slice
    val expected = graft.sources.Tables.read(spark, sf0001, "documents")
      .filter(col("doc_id") % 10 === 7).select(col("doc_id"))
      .collect().map(_.getLong(0)).sorted
    stream.map(_.getAs[Long]("doc_id")).sorted shouldBe expected
  }

  test("q211: batch 0 is all-novel, novel counts sum to the global distinct-gram count") {
    val rows = q("q211_ngram_novelty").orderBy(col("batch")).collect()
    rows.length shouldBe 10
    // the first batch has no history: everything it sees is novel
    rows.head.getAs[Long]("batch") shouldBe 0L
    rows.head.getAs[Long]("n_novel") shouldBe rows.head.getAs[Long]("n_distinct")
    rows.head.getAs[Double]("novelty_rate") shouldBe 1.0
    rows.foreach { r =>
      r.getAs[Long]("n_novel") should be <= r.getAs[Long]("n_distinct")
      r.getAs[Long]("n_distinct") should be <= r.getAs[Long]("n_occurrences")
    }
    // each distinct gram is novel in exactly ONE batch (its first)
    val globalDistinct = graft.sources.Tables.read(spark, sf0001, "documents")
      .selectExpr("""explode(transform(sequence(1, size(split(trim(text), ' ')) - 2),
        i -> array_join(slice(split(trim(text), ' '), i, 3), ' '))) AS gram""")
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_novel")).sum == globalDistinct)
  }

  test("q210: packing dominates padding, truncation is monotone in context, counts conserve") {
    val rows = q("q210_packing_curve").orderBy(col("context")).collect()
    rows.map(_.getAs[Long]("context")) shouldBe Array(32L, 64L, 128L, 256L)
    val nDocs = rows.map(_.getAs[Long]("n_docs")).distinct
    nDocs.length shouldBe 1 // every context sees the whole corpus
    val total = rows.map(_.getAs[Long]("tokens_total")).distinct
    total.length shouldBe 1
    rows.foreach { r =>
      r.getAs[Long]("tokens_kept") should be <= r.getAs[Long]("tokens_total")
      // concatenation packing can only beat one-doc-per-sequence
      r.getAs[Double]("eff_packed") should be >= r.getAs[Double]("eff_unpacked") - 1e-9
      r.getAs[Double]("eff_packed") should be <= 1.0
      // seqs is a true ceil: seqs*C covers kept, (seqs-1)*C does not
      val (c, kept, seqs) = (r.getAs[Long]("context"),
        r.getAs[Long]("tokens_kept"), r.getAs[Long]("seqs_packed"))
      (seqs * c) should be >= kept
    }
    // larger context ⇒ fewer (or equal) truncated docs, more (or equal) kept tokens
    rows.sliding(2).foreach { case Array(a, b) =>
      b.getAs[Long]("n_docs_trunc") should be <= a.getAs[Long]("n_docs_trunc")
      b.getAs[Long]("tokens_kept") should be >= a.getAs[Long]("tokens_kept")
    }
  }

  test("q209: calibration buckets partition q102's eval set and reconcile its accuracy") {
    val cal = q("q209_nb_calibration").collect()
    val known = Set("m0_lt_0.5", "m1_lt_1", "m2_lt_2", "m3_lt_4", "m4_ge_4")
    cal.foreach(r => known should contain(r.getString(0)))
    val argmax = q("q102_nb_langid").collect()
    // every eval doc lands in exactly one margin bucket
    cal.map(_.getAs[Long]("n_docs")).sum shouldBe argmax.length.toLong
    // and per-bucket corrects sum to the classifier's total corrects
    cal.map(_.getAs[Long]("n_correct")).sum shouldBe
      argmax.map(_.getAs[Long]("correct")).sum
    cal.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      acc should (be >= 0.0 and be <= 1.0)
    }
  }

  test("q206: MI is non-negative, bounded by min marginal entropy, and the entropy identity holds") {
    val rows = q("q206_mi_association").collect()
    rows.map(_.getString(0)).sorted shouldBe Array("lang_label", "src_label", "src_lang")
    rows.foreach { r =>
      val (hx, hy, hxy, mi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      hx should be >= 0.0
      hy should be >= 0.0
      // subadditivity and the defining identity on the emitted (rounded) values
      mi shouldBe BigDecimal(hx + hy - hxy).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      mi should be >= -1e-6 // rounding can graze zero from below
      mi should be <= math.min(hx, hy) + 1e-6
    }
  }
}
