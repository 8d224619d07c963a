package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Mathematical invariants of the round-15 operators — properties the
  * DuckDB hash gate can't express because they must hold on ANY corpus,
  * not just equal the oracle on this one: metric ranges (kappa ≤ 1,
  * |ACF| ≤ 1, 0 ≤ NMI ≤ 1, 0 ≤ R² ≤ 1), conservation (BT wins ≤
  * comparisons, SPRT conversions ≤ enrollments), and monotonicity (k-core
  * counts never grow under peeling, cumulative enrollment never shrinks). */
class Round15InvariantsSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  private def rows(q: String): Seq[Row] =
    SparkEntry.queries(q)(spark, sf0001).collect().toSeq

  test("q274: kappa is chance-bounded and both agreement rates are probabilities") {
    val r = rows("q274_rater_kappa")
    r should have size 1
    val (po, pe, k) = (r.head.getAs[Double]("po"), r.head.getAs[Double]("pe"),
      r.head.getAs[Double]("kappa"))
    po should (be >= 0.0 and be <= 1.0)
    pe should (be >= 0.0 and be <= 1.0)
    k should be <= 1.0
    // kappa's sign must match whether observed agreement beats chance
    math.signum(k) shouldBe math.signum(BigDecimal(po - pe)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q275: one row per lag, every ACF inside [-1, 1]") {
    val r = rows("q275_daily_acf")
    r.map(_.getLong(0)) shouldBe (1L to 7L)
    r.foreach { row =>
      if (!row.isNullAt(row.fieldIndex("acf")))
        row.getAs[Double]("acf") should (be >= -1.0 and be <= 1.0)
    }
  }

  test("q277: R-squared is a proportion of variance") {
    val r = rows("q277_order_ols")
    r should have size 1
    r.head.getAs[Double]("r_squared") should (be >= 0.0 and be <= 1.0 + 1e-6)
  }

  test("q278: entropies obey subadditivity and NMI is normalized") {
    val r = rows("q278_cell_label_nmi").head
    val (hc, hl, hj) = (r.getAs[Double]("h_cell"), r.getAs[Double]("h_label"),
      r.getAs[Double]("h_joint"))
    hj should be <= hc + hl + 1e-6          // MI >= 0
    hj should be >= math.max(hc, hl) - 1e-6 // conditioning can't add entropy
    r.getAs[Double]("nmi") should (be >= -1e-6 and be <= 1.0 + 1e-6)
  }

  test("q279: BT strengths are positive, wins conserved, rank a permutation") {
    val r = rows("q279_bradley_terry")
    r.foreach { row =>
      row.getAs[Double]("bt_strength") should be > 0.0
      row.getAs[Double]("wins") should be <= row.getAs[Long]("n_comparisons").toDouble
    }
    r.map(_.getAs[Long]("rnk")).sorted shouldBe (1L to r.size)
    // total wins across sources = total comparisons (each match awards 1)
    val totW = r.map(_.getAs[Double]("wins")).sum
    val totN = r.map(_.getAs[Long]("n_comparisons")).sum
    totW shouldBe totN.toDouble / 2 +- 1e-6 // mirrored frame counts each match twice
  }

  test("q280: peeling never grows the graph and counts stay consistent") {
    val r = rows("q280_kcore_peel")
    r.map(_.getLong(0)) shouldBe (1L to 6L)
    val nodes = r.map(_.getAs[Long]("n_nodes"))
    val edges = r.map(_.getAs[Long]("n_edges"))
    nodes.sliding(2).foreach { case Seq(a, b) => b should be <= a; case _ => }
    edges.sliding(2).foreach { case Seq(a, b) => b should be <= a; case _ => }
    // a surviving 2-core node has degree >= 2 => edges >= nodes
    if (nodes.last > 0) edges.last should be >= nodes.last
  }

  test("q281: enrollment accumulates and conversions never exceed it") {
    val r = rows("q281_sprt_monitor")
    r should not be empty
    val ns = r.map(row => row.getAs[Long]("na") + row.getAs[Long]("nb"))
    ns.sliding(2).foreach { case Seq(a, b) => b should be >= a; case _ => }
    r.foreach { row =>
      row.getAs[Long]("ca") should be <= row.getAs[Long]("na")
      row.getAs[Long]("cb") should be <= row.getAs[Long]("nb")
    }
  }

  test("q282: ESS lies in [1, n_docs] and the ratio in (0, 1]") {
    val r = rows("q282_dsir_ess")
    r should not be empty
    r.foreach { row =>
      val (n, ess) = (row.getAs[Long]("n_docs"), row.getAs[Double]("ess"))
      ess should (be >= 1.0 - 1e-6 and be <= n.toDouble + 1e-6)
      row.getAs[Double]("ess_ratio") should (be > 0.0 and be <= 1.0 + 1e-6)
    }
  }

  test("q273: at most 5 terms per source, z-ordered with support floor") {
    val r = rows("q273_source_log_odds")
    r.groupBy(_.getAs[String]("source")).foreach { case (_, g) =>
      g.size should be <= 5
      g.map(_.getAs[Long]("rnk")).sorted shouldBe (1L to g.size)
      val zs = g.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("z_odds"))
      zs.sliding(2).foreach { case Seq(a, b) => b should be <= a; case _ => }
      g.foreach(_.getAs[Long]("n_in_source") should be >= 5L)
    }
  }

  test("q294: late-order census never exceeds the quarter's order population") {
    val r = rows("q294_late_priority")
    r should not be empty
    r.foreach(_.getAs[Long]("order_count") should be >= 1L)
    // the EXISTS semi-join must count each order at most once: the census
    // total is bounded by the quarter's order count straight off the fixture
    val quarter = graft.sources.Tables.read(spark, sf0001, "orders")
      .filter(org.apache.spark.sql.functions.col("o_orderdate")
        .between("1996-01-01", "1996-03-31 23:59:59"))
      .count()
    r.map(_.getAs[Long]("order_count")).sum should be <= quarter
  }

  test("q295: discount-band revenue is filter-monotone against the full scan") {
    val r = rows("q295_discount_revenue")
    r should have size 1
    val (rev, n) = (r.head.getAs[Double]("revenue"), r.head.getAs[Long]("n_lines"))
    n should be >= 0L
    if (n == 0) rev shouldBe 0.0
    else rev should be > 0.0
    // dropping every predicate can only add non-negative revenue elements
    import org.apache.spark.sql.functions._
    val all = graft.sources.Tables.read(spark, sf0001, "lineitem")
      .agg(sum((col("l_extendedprice") * col("l_discount"))
        .cast(org.apache.spark.sql.types.DecimalType(18, 4))).cast("double"))
      .head.getDouble(0)
    rev should be <= all
  }

  test("q296: tau-b is bounded and the pair partition is conserved") {
    val r = rows("q296_kendall_tau")
    r should have size 1
    val row = r.head
    val (n0, conc, disc) = (row.getAs[Long]("n0"), row.getAs[Long]("conc"),
      row.getAs[Long]("disc"))
    // strict-concordant + strict-discordant pairs can never exceed the
    // pair universe, and any remainder must be tied in x or y
    (conc + disc) should be <= n0
    (n0 - conc - disc) should be <= (row.getAs[Long]("tx") + row.getAs[Long]("ty"))
    row.getAs[Double]("tau_b") should (be >= -1.0 and be <= 1.0)
  }

  test("q297: HHI sits in (1/n, 1] and n_effective never exceeds the census") {
    val r = rows("q297_supplier_hhi")
    r should not be empty
    r.foreach { row =>
      val (n, hhi) = (row.getAs[Long]("n_suppliers"), row.getAs[Double]("hhi"))
      hhi should (be > 0.0 and be <= 1.0 + 1e-9)
      // equal shares minimize HHI at exactly 1/n
      hhi should be >= 1.0 / n - 1e-6
      row.getAs[Double]("n_effective") should be <= n.toDouble + 1e-6
    }
  }

  test("q298: reliability rows are probabilistically coherent (Jensen bound)") {
    val r = rows("q298_calibration_brier")
    r should not be empty
    r.foreach { row =>
      val (mp, obs, br) = (row.getAs[Double]("mean_pred"),
        row.getAs[Double]("obs_rate"), row.getAs[Double]("brier"))
      mp should (be >= 0.0 and be <= 1.0)
      obs should (be >= 0.0 and be <= 1.0)
      br should (be >= 0.0 and be <= 1.0)
      row.getAs[Long]("n_pos") should be <= row.getAs[Long]("n_docs")
      // E[(p−y)²] ≥ (E[p]−E[y])² within a bucket (Jensen)
      br should be >= (mp - obs) * (mp - obs) - 1e-6
    }
  }

  test("q299: assortativity is a correlation and the edge census is even") {
    val r = rows("q299_degree_assortativity")
    r should have size 1
    val row = r.head
    row.getAs[Long]("m2") % 2 shouldBe 0L // both orientations of each edge
    row.getAs[Double]("s2") should be >=
      row.getAs[Double]("mu") * row.getAs[Double]("mu") - 1e-6
    row.getAs[Double]("assortativity") should (be >= -1.0 - 1e-6 and be <= 1.0 + 1e-6)
  }

  test("q300: jackknife SE is nonnegative and the bucket census is full") {
    val r = rows("q300_jackknife_quality")
    r should have size 1
    r.head.getAs[Long]("n_buckets") shouldBe 10L
    r.head.getAs[Double]("mean_quality") should (be > 0.0 and be <= 1.0)
    r.head.getAs[Double]("se_jack") should be >= 0.0
  }

  test("q301: silhouettes land in [0,1] and the cell census covers the corpus") {
    val r = rows("q301_cell_silhouette")
    r should not be empty
    // assignment IS the cosine argmax, so a <= b and silhouette >= 0
    r.foreach(_.getAs[Double]("mean_silhouette") should (be >= 0.0 and be <= 1.0))
    r.foreach(_.getAs[Long]("cell") should (be >= 0L and be <= 7L))
    val total = graft.sources.Tables.read(spark, sf0001, "embeddings").count()
    r.map(_.getAs[Long]("n_vectors")).sum shouldBe total
  }

  test("q302: the log-rank pieces are nonnegative and O1 is bounded by events") {
    val r = rows("q302_logrank")
    r should have size 1
    val row = r.head
    row.getAs[Long]("o1") should be >= 0L
    row.getAs[Double]("e1") should be >= 0.0
    row.getAs[Double]("v") should be >= 0.0
    row.getAs[Double]("chi2") should be >= 0.0
  }

  test("q303: every shrunk rate sits between its raw rate and the prior mean") {
    val r = rows("q303_eb_shrinkage")
    r should not be empty
    r.foreach { row =>
      val (raw, shrunk, m) = (row.getAs[Double]("raw_rate"),
        row.getAs[Double]("shrunk_rate"), row.getAs[Double]("prior_mean"))
      shrunk should be >= math.min(raw, m) - 1e-6
      shrunk should be <= math.max(raw, m) + 1e-6
      row.getAs[Double]("prior_strength") should be > 0.0
    }
  }

  test("q304: the 2x2 cells partition the eval slice and chi2 is nonnegative") {
    val r = rows("q304_mcnemar")
    r should have size 1
    val row = r.head
    val cells = Seq("both_right", "both_wrong", "heur_only", "nb_only")
      .map(row.getAs[Long])
    cells.sum shouldBe row.getAs[Long]("n_docs")
    cells.foreach(_ should be >= 0L)
    row.getAs[Double]("chi2") should be >= 0.0
  }

  test("q305: count-of-count identities hold per source") {
    val r = rows("q305_missing_mass")
    r should not be empty
    r.foreach { row =>
      val (tok, typ, h1, h2) = (row.getAs[Long]("n_tokens"), row.getAs[Long]("n_types"),
        row.getAs[Long]("n_hapax"), row.getAs[Long]("n_dis"))
      typ should be <= tok
      (h1 + h2) should be <= typ
      // tokens from hapax+dis types alone can never exceed the total
      (h1 + 2 * h2) should be <= tok
      row.getAs[Double]("p_unseen") should (be >= 0.0 and be <= 1.0)
    }
  }

  test("q306: Fleiss components are probabilities and kappa is bounded") {
    val r = rows("q306_fleiss_kappa")
    r should have size 1
    val row = r.head
    row.getAs[Double]("p_bar") should (be >= 0.0 and be <= 1.0)
    row.getAs[Double]("p_e") should (be >= 0.0 and be <= 1.0)
    row.getAs[Double]("kappa") should be <= 1.0
  }

  test("q307: both allocations exhaust the budget and Neyman tilts to variance") {
    val r = rows("q307_neyman_allocation")
    r should not be empty
    val neyman = r.map(_.getAs[Double]("neyman_alloc"))
    val prop = r.map(_.getAs[Double]("prop_alloc"))
    neyman.sum shouldBe 1000.0 +- 0.01
    prop.sum shouldBe 1000.0 +- 0.01
    neyman.foreach(_ should be >= 0.0)
    r.foreach(_.getAs[Double]("sigma") should be >= 0.0)
  }

  test("q308: capture sets nest and the L-P estimate dominates each capture") {
    val r = rows("q308_capture_recapture")
    r should have size 1
    val row = r.head
    val (nt, n1, n2, nb) = (row.getAs[Long]("n_true"), row.getAs[Long]("n_lsh"),
      row.getAs[Long]("n_simhash"), row.getAs[Long]("n_both"))
    nb should be <= math.min(n1, n2)
    n1 should be <= nt
    n2 should be <= nt
    if (!row.isNullAt(row.fieldIndex("n_hat"))) {
      // n̂ = n1·n2/m >= max(n1, n2) whenever m <= min(n1, n2)
      row.getAs[Double]("n_hat") should be >= math.max(n1, n2).toDouble - 1e-6
    }
  }

  test("q309: Chao1 never shrinks the observed vocabulary") {
    val r = rows("q309_chao1_richness")
    r should not be empty
    r.foreach { row =>
      row.getAs[Double]("chao1") should be >= row.getAs[Long]("n_types").toDouble - 1e-6
      row.getAs[Double]("completeness") should (be > 0.0 and be <= 1.0 + 1e-9)
      row.getAs[Double]("undetected") should be >= 0.0
    }
  }

  test("q310: conditioning can only reduce entropy; perplexity >= 1") {
    val r = rows("q310_conditional_entropy")
    r should have size 1
    val row = r.head
    // H(w2|w1) = H(pair) - H(first) is nonnegative and bounded by H(pair)
    row.getAs[Double]("h_cond") should be >= -1e-6
    row.getAs[Double]("h_cond") should be <= row.getAs[Double]("h_bigram") + 1e-6
    row.getAs[Double]("perplexity") should be >= 1.0 - 1e-6
  }

  test("q311: the retention triangle starts at 1.0 and rates are probabilities") {
    val r = rows("q311_cohort_retention")
    r should not be empty
    r.filter(_.getAs[Long]("weeks_since") == 0L)
      .foreach(_.getAs[Double]("retention") shouldBe 1.0)
    r.foreach { row =>
      row.getAs[Long]("n_active") should be <= row.getAs[Long]("n_cohort")
      row.getAs[Double]("retention") should (be > 0.0 and be <= 1.0)
      row.getAs[Long]("weeks_since") should be >= 0L
    }
  }

  test("q312: info gain is bounded by H(y) and the planted uniform feature is null") {
    val r = rows("q312_info_gain")
    r.map(_.getAs[String]("feature")).sorted shouldBe
      Seq("f1_hod_bucket", "f2_weekend", "f3_props_k")
    r.foreach { row =>
      val ig = row.getAs[Double]("info_gain")
      ig should be >= -1e-6
      ig should be <= row.getAs[Double]("h_y") + 1e-6
    }
    // props k is uniform and independent of purchase-ness (q142): near-zero gain
    r.find(_.getAs[String]("feature") == "f3_props_k").get
      .getAs[Double]("info_gain") should be < 0.01
  }

  test("q313: the DiD contrast reconciles with its four cell means") {
    val r = rows("q313_diff_in_diff")
    r should have size 1
    val row = r.head
    val did = (row.getAs[Double]("m_a_post") - row.getAs[Double]("m_a_pre")) -
      (row.getAs[Double]("m_b_post") - row.getAs[Double]("m_b_pre"))
    row.getAs[Double]("did") shouldBe
      BigDecimal(did).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("q314: readability ratios are positive and words-per-sentence >= 1 token") {
    val r = rows("q314_readability")
    r should not be empty
    r.foreach { row =>
      row.getAs[Double]("mean_wps") should be > 0.0
      row.getAs[Double]("mean_spw") should be > 0.0
      // Flesch is bounded above by its constant when both ratios are positive
      row.getAs[Double]("mean_flesch") should be < 206.835
    }
  }

  test("q315: Delta is a nonnegative symmetric-form distance over the full grid") {
    val r = rows("q315_burrows_delta")
    r should not be empty
    r.foreach { row =>
      row.getAs[Double]("delta") should be >= 0.0
      row.getAs[String]("src_a") should be < row.getAs[String]("src_b")
      row.getAs[Long]("n_terms") should be <= 50L
    }
  }

  test("q316: S is bounded by the pair count and z is finite") {
    val r = rows("q316_mann_kendall")
    r should have size 1
    val row = r.head
    val n = row.getAs[Long]("n_days")
    math.abs(row.getAs[Long]("s_mk")) should be <= n * (n - 1) / 2
    row.getAs[Double]("var_s") should be > 0.0
    row.getAs[Double]("z_mk").isNaN shouldBe false
  }

  test("q317: the runs census is internally consistent") {
    val r = rows("q317_runs_test")
    r should have size 1
    val row = r.head
    val (up, down, runs) = (row.getAs[Long]("n_up"), row.getAs[Long]("n_down"),
      row.getAs[Long]("n_runs"))
    runs should be >= 1L
    runs should be <= up + down
    // runs of two symbols can't exceed 2*min+1
    runs should be <= 2 * math.min(up, down) + 1
    row.getAs[Double]("e_runs") should be > 0.0
    row.getAs[Double]("var_runs") should be > 0.0
  }

  test("q318/q319: sums of squares are nonnegative and eta-squared is a fraction") {
    Seq("q318_anova_quality", "q319_brown_forsythe").foreach { q =>
      val r = rows(q)
      r should have size 1
      val row = r.head
      row.getAs[Double]("ssb") should be >= 0.0
      row.getAs[Double]("ssw") should be >= 0.0
      row.getAs[Double]("eta_sq") should (be >= 0.0 and be <= 1.0)
      row.getAs[Double]("f_stat") should be >= 0.0
      row.getAs[Long]("n_groups") should be >= 2L
    }
  }

  test("q320: resultant length is in [0,1] and the peak hour on the clock") {
    val r = rows("q320_circular_peak")
    r should not be empty
    r.foreach { row =>
      row.getAs[Double]("r_bar") should (be >= 0.0 and be <= 1.0 + 1e-9)
      val ph = row.getAs[Double]("peak_hour")
      ph should (be >= 0.0 and be < 24.0 + 1e-9)
      row.getAs[Long]("n_events") should be > 0L
    }
  }

  test("q321: the weekly ANOVA sees all seven weekdays") {
    val r = rows("q321_weekly_seasonality")
    r should have size 1
    r.head.getAs[Long]("n_groups") shouldBe 7L
    r.head.getAs[Double]("eta_sq") should (be >= 0.0 and be <= 1.0)
  }

  test("q322: KS gap is a probability-scale supremum over the grid") {
    val r = rows("q322_ks_drift")
    r should have size 1
    val row = r.head
    row.getAs[Double]("ks_d") should (be >= 0.0 and be <= 1.0)
    row.getAs[Long]("at_bucket") should (be >= 0L and be <= 999L)
    row.getAs[Long]("n0") + row.getAs[Long]("n1") should be > 0L
  }

  test("q323: OOV counts nest inside the eval census") {
    val r = rows("q323_oov_audit")
    r should not be empty
    r.foreach { row =>
      row.getAs[Long]("n_oov_tokens") should be <= row.getAs[Long]("n_eval_tokens")
      row.getAs[Long]("n_new_types") should be <= row.getAs[Long]("n_eval_types")
      row.getAs[Double]("oov_rate") should (be >= 0.0 and be <= 1.0)
      row.getAs[Double]("new_type_rate") should (be >= 0.0 and be <= 1.0)
    }
  }

  test("q324: every brand fits and degenerate groups surface as NULL slopes") {
    val r = rows("q324_grouped_ols")
    r should not be empty
    r.foreach { row =>
      row.getAs[Long]("n_lines") should be > 0L
      if (!row.isNullAt(row.fieldIndex("slope"))) {
        // discounts and quantities are bounded, so the fitted line's value
        // at x=0 must stay within the quantity range's convex hull slack
        row.getAs[Double]("intercept") should (be > -1000.0 and be < 1000.0)
      }
    }
  }

  test("q325: RMST is positive and bounded by the horizon") {
    val r = rows("q325_rmst")
    r should have size 1
    val row = r.head
    val (tau, rmst) = (row.getAs[Long]("horizon_days"), row.getAs[Double]("rmst_days"))
    rmst should be > 0.0
    rmst should be <= tau.toDouble + 1e-6
    row.getAs[Long]("first_event_day") should be <= tau
  }

  test("q326: the winsorized mean sits inside the clamp and below the raw tail pull") {
    val r = rows("q326_winsorized_mean")
    r should have size 1
    val row = r.head
    val (lo, hi) = (row.getAs[Double]("p05_value"), row.getAs[Double]("p95_value"))
    lo should be <= hi
    val wm = row.getAs[Double]("winsorized_mean")
    wm should (be >= lo and be <= hi)
    // order values are right-skewed: clamping the top tail pulls the mean DOWN
    wm should be <= row.getAs[Double]("raw_mean") + 1e-6
  }

  test("q327: gains accumulate monotonically to 1.0 and dominate share") {
    val r = rows("q327_gains_curve").sortBy(_.getAs[Long]("decile"))
    r.map(_.getAs[Long]("decile")) shouldBe (1L to r.size)
    val gains = r.map(_.getAs[Double]("gain"))
    gains.sliding(2).foreach { case Seq(a, b) => b should be >= a; case _ => }
    gains.last shouldBe 1.0
    r.last.getAs[Double]("share") shouldBe 1.0
    // gain can never exceed every-positive-captured
    gains.foreach(_ should be <= 1.0 + 1e-9)
  }

  test("q328: the depth histogram and its geometric fit both total the sessions") {
    val r = rows("q328_depth_geometric")
    r should not be empty
    val obs = r.map(_.getAs[Long]("obs"))
    obs.foreach(_ should be > 0L)
    r.foreach { row =>
      row.getAs[Double]("phat") should (be > 0.0 and be <= 1.0)
      row.getAs[Double]("expected") should be >= 0.0
    }
    // the fitted masses over the binned support can never exceed n_sessions
    val exp = r.map(_.getAs[Double]("expected")).sum
    exp should be <= obs.sum.toDouble + 1e-3
  }

  test("q329: expected counts reconcile with observed margins") {
    val r = rows("q329_residual_cells")
    r should not be empty
    val obsSum = r.map(_.getAs[Long]("obs")).sum
    val expSum = r.map(_.getAs[Double]("expected")).sum
    // over the OBSERVED cells only, Σ expected can't exceed Σ observed = N
    // (the full-grid identity Σ nr·nc/N = N includes the zero cells)
    expSum should be <= obsSum.toDouble + 0.01 * r.size
    expSum should be > 0.0
    r.foreach(_.getAs[Double]("expected") should be > 0.0)
  }

  test("q330: the dispersion pieces are internally consistent") {
    val r = rows("q330_overdispersion")
    r should have size 1
    val row = r.head
    row.getAs[Double]("mean_daily") should be > 0.0
    row.getAs[Double]("var_daily") should be >= 0.0
    val id = row.getAs[Double]("dispersion_index")
    id should be >= 0.0
    if (!row.isNullAt(row.fieldIndex("nb_size")))
      row.getAs[Double]("nb_size") should be > 0.0
  }

  test("q331: every CCF value is a correlation and lag 0 is positive") {
    val r = rows("q331_ccf")
    r.map(_.getAs[Long]("lag")).sorted shouldBe (-3L to 3L)
    r.foreach(_.getAs[Double]("ccf") should (be >= -1.0 - 1e-6 and be <= 1.0 + 1e-6))
    // count and revenue on the SAME day co-move by construction
    r.find(_.getAs[Long]("lag") == 0L).get.getAs[Double]("ccf") should be > 0.0
  }

  test("q332: PACF(1) equals ACF(1) and all partials are correlations") {
    val r = rows("q332_pacf")
    r should have size 1
    val row = r.head
    Seq("pacf1", "pacf2", "pacf3").foreach { c =>
      row.getAs[Double](c) should (be >= -1.0 - 1e-6 and be <= 1.0 + 1e-6)
    }
  }

  test("q333: the Theil ratio reconciles with its two RMSEs") {
    val r = rows("q333_seasonal_naive")
    r should have size 1
    val row = r.head
    val (r1, r7, u) = (row.getAs[Double]("rmse_naive1"),
      row.getAs[Double]("rmse_seasonal7"), row.getAs[Double]("theil_u"))
    r1 should be >= 0.0
    r7 should be >= 0.0
    if (r1 > 0) u shouldBe (r7 / r1) +- 1e-3
  }

  test("q334: anisotropy is a fraction of total embedding energy") {
    val r = rows("q334_anisotropy")
    r should have size 1
    val row = r.head
    // ||mean||^2 <= mean ||v||^2 (Jensen), so the ratio is in [0, 1]
    row.getAs[Double]("anisotropy") should (be >= 0.0 and be <= 1.0 + 1e-6)
    row.getAs[Double]("mean_norm2") should be > 0.0
    row.getAs[Double]("rms_norm") should be > 0.0
  }

  test("q335: z-based moments behave (kurtosis >= skewness^2 - 2)") {
    // sf0.001 has <5 suppliers per nation, so the n>=5 floor may empty the
    // frame — the oracle agrees; assert shape properties on whatever rows exist
    val r = rows("q335_grouped_moments")
    r.foreach { row =>
      row.getAs[Long]("n_suppliers") should be >= 5L
      row.getAs[Double]("sd_bal") should be > 0.0
      val sk = row.getAs[Double]("skewness")
      val ku = row.getAs[Double]("kurtosis_excess")
      // Pearson's inequality: kurtosis >= skewness² + 1, i.e. excess >= sk² - 2
      ku should be >= sk * sk - 2.0 - 0.01
    }
  }

  test("q336: the Rayleigh quotient is positive and bounded by the trace") {
    val r = rows("q336_top_eigen")
    r should have size 1
    val row = r.head
    val (tr, l1) = (row.getAs[Double]("trace"), row.getAs[Double]("lambda1"))
    tr should be > 0.0
    l1 should be > 0.0
    // any Rayleigh quotient of a PSD Gram matrix is <= lambda_max <= trace
    l1 should be <= tr + 1e-6
    row.getAs[Double]("explained_share") should (be > 0.0 and be <= 1.0)
  }

  test("q337: payload-dedup counts nest and rates are fractions") {
    val r = rows("q337_payload_dedup")
    r should not be empty
    r.foreach { row =>
      row.getAs[Long]("n_distinct") should be <= row.getAs[Long]("n_items")
      row.getAs[Long]("n_dup_items") shouldBe
        row.getAs[Long]("n_items") - row.getAs[Long]("n_distinct")
      row.getAs[Double]("dup_rate") should (be >= 0.0 and be <= 1.0)
    }
  }

  test("q338: the real flatMap pipeline keeps the every-4th frame budget") {
    val r = rows("q338_frame_accounting")
    r should not be empty
    r.foreach { row =>
      val (kept, orig) = (row.getAs[Long]("bytes_kept"), row.getAs[Long]("orig_bytes"))
      kept should be <= orig
      kept should be <= row.getAs[Long]("n_frames") * 256
      // keeping every 4th 256-byte frame retains at least floor share
      row.getAs[Double]("keep_ratio") should (be > 0.0 and be <= 1.0)
    }
  }

  test("q339: at-risk counts shrink with tenure and hazards are probabilities") {
    val r = rows("q339_churn_hazard").sortBy(_.getAs[Long]("tenure_weeks"))
    r should not be empty
    val risks = r.map(_.getAs[Long]("n_at_risk"))
    risks.sliding(2).foreach { case Seq(a, b) => b should be <= a; case _ => }
    r.foreach { row =>
      row.getAs[Long]("n_churned") should be <= row.getAs[Long]("n_at_risk")
      row.getAs[Double]("hazard") should (be >= 0.0 and be <= 1.0)
    }
  }

  test("q340: the Lorenz curve is convex-ordered and ends at 1.0") {
    val r = rows("q340_lorenz_deciles").sortBy(_.getAs[Long]("decile"))
    r should not be empty
    val shares = r.map(_.getAs[Double]("cum_revenue_share"))
    shares.sliding(2).foreach { case Seq(a, b) => b should be >= a; case _ => }
    shares.last shouldBe 1.0
    // sorting poorest-first keeps the curve under the diagonal
    r.foreach { row =>
      row.getAs[Double]("cum_revenue_share") should be <=
        row.getAs[Double]("cum_pop_share") + 1e-6
    }
  }

  test("q341: reliability is a correlation and Spearman-Brown amplifies it") {
    val r = rows("q341_split_half")
    r should have size 1
    val row = r.head
    val rh = row.getAs[Double]("r_half")
    rh should (be >= -1.0 - 1e-6 and be <= 1.0 + 1e-6)
    val sb = row.getAs[Double]("spearman_brown")
    // for positive r, the full-length correction can only increase it
    if (rh > 0) sb should be >= rh - 1e-6
    sb should be <= 1.0 + 1e-6
  }

  test("q342: W+ is bounded by the total rank mass") {
    val r = rows("q342_signed_rank")
    r should have size 1
    val row = r.head
    val n = row.getAs[Long]("n_pairs")
    val wp = row.getAs[Double]("w_plus")
    wp should be >= 0.0
    wp should be <= n.toDouble * (n + 1) / 2 + 1e-6
    row.getAs[Double]("z_wilcoxon").isNaN shouldBe false
  }

  test("q343: Hedges' g shrinks Cohen's d and the pair grid is complete") {
    val r = rows("q343_effect_sizes")
    r should not be empty
    r.foreach { row =>
      val (d, gg) = (row.getAs[Double]("cohen_d"), row.getAs[Double]("hedges_g"))
      math.abs(gg) should be <= math.abs(d) + 1e-6
      row.getAs[String]("src_a") should be < row.getAs[String]("src_b")
    }
    val k = r.map(_.getAs[String]("src_a")).distinct.size + 1
    r.size shouldBe k * (k - 1) / 2
  }

  test("q344: within-cell distance never grows with more cells") {
    val r = rows("q344_ivf_elbow").sortBy(_.getAs[Long]("kc"))
    r.map(_.getAs[Long]("kc")) shouldBe Seq(2L, 4L, 8L, 16L)
    val means = r.map(_.getAs[Double]("mean_dist"))
    // centroid sets are nested (lowest-id prefix), so the best-cosine
    // assignment can only improve as k grows
    means.sliding(2).foreach { case Seq(a, b) => b should be <= a + 1e-9; case _ => }
    means.foreach(_ should be >= 0.0)
  }

  test("q345: bands bracket the survival curve and widen only with information loss") {
    val r = rows("q345_km_greenwood")
    r should not be empty
    r.foreach { row =>
      val (s0, lo, hi) = (row.getAs[Double]("survival"),
        row.getAs[Double]("ci_lo"), row.getAs[Double]("ci_hi"))
      lo should be <= s0 + 1e-9
      hi should be >= s0 - 1e-9
      lo should be >= 0.0
      hi should be <= 1.0
      row.getAs[Double]("se_greenwood") should be >= 0.0
    }
  }

  test("q346: the Hill estimate is positive over a bounded tail sample") {
    val r = rows("q346_hill_tail")
    r should have size 1
    val row = r.head
    row.getAs[Long]("n_tail") should be <= 100L
    row.getAs[Double]("threshold") should be > 0.0
    row.getAs[Double]("hill_alpha") should be > 0.0
  }

  test("q347: cadence statistics are positive with enough gaps") {
    val r = rows("q347_order_cadence")
    r.foreach { row =>
      row.getAs[Long]("n_gaps") should be >= 5L
      row.getAs[Double]("mean_gap_days") should be > 0.0
      row.getAs[Double]("sd_gap") should be >= 0.0
      row.getAs[Double]("cov") should be >= 0.0
    }
  }

  test("q348: raising the cutoff keeps fewer docs of higher mean quality") {
    val r = rows("q348_quality_threshold_curve").sortBy(_.getAs[Double]("tau"))
    r should have size 6
    val kept = r.map(_.getAs[Long]("n_kept"))
    kept.sliding(2).foreach { case Seq(a, b) => b should be <= a; case _ => }
    val means = r.filter(!_.isNullAt(4)).map(_.getAs[Double]("mean_kept_quality"))
    means.sliding(2).foreach { case Seq(a, b) => b should be >= a - 1e-9; case _ => }
    r.foreach { row =>
      row.getAs[Double]("keep_rate") should (be >= 0.0 and be <= 1.0)
      if (!row.isNullAt(row.fieldIndex("mean_kept_quality")))
        row.getAs[Double]("mean_kept_quality") should be >= row.getAs[Double]("tau")
    }
  }

  test("q349: the channel brackets and breakouts are mutually exclusive") {
    val r = rows("q349_rolling_channel")
    r should not be empty
    r.foreach { row =>
      row.getAs[Double]("channel_lo") should be <= row.getAs[Double]("channel_hi")
      (row.getAs[Long]("breakout_up") + row.getAs[Long]("breakout_down")) should be <= 1L
      if (row.getAs[Long]("breakout_up") == 1L)
        row.getAs[Double]("rev") should be > row.getAs[Double]("channel_hi")
    }
  }

  test("q350: anomalies rank by |z| and respect the weekday conditioning") {
    val r = rows("q350_calendar_anomalies")
    r.size should be <= 10
    val zs = r.map(row => math.abs(row.getAs[Double]("z")))
    zs.sliding(2).foreach { case Seq(a, b) => b should be <= a + 1e-9; case _ => }
    r.foreach(_.getAs[Long]("dow") should (be >= 0L and be <= 6L))
  }

  test("q351: Ljung-Box Q accumulates monotonically over lags 1..7") {
    val r = rows("q351_ljung_box")
    r.map(_.getAs[Long]("lag")) shouldBe (1L to 7L)
    r.foreach { row =>
      if (!row.isNullAt(row.fieldIndex("acf")))
        row.getAs[Double]("acf") should (be >= -1.0 and be <= 1.0)
    }
    val qs = r.filter(!_.isNullAt(3)).map(_.getAs[Double]("lb_q"))
    qs.foreach(_ should be >= 0.0)
    qs.sliding(2).foreach { case Seq(a, b) => b should be >= a - 1e-9; case _ => }
    // each lag leg pairs strictly fewer days than the one before (contiguous calendar)
    val np = r.map(_.getAs[Long]("n_pairs"))
    np.sliding(2).foreach { case Seq(a, b) => b should be <= a; case _ => }
  }

  test("q352: block counts shrink with block size and H is a finite estimate") {
    val r = rows("q352_hurst_rs")
    r should have size 1
    val row = r.head
    val (k5, k10, k15) = (row.getAs[Long]("n_blocks_5"),
      row.getAs[Long]("n_blocks_10"), row.getAs[Long]("n_blocks_15"))
    k5 should be >= k10
    k10 should be >= k15
    k15 should be >= 1L
    val h = row.getAs[Double]("hurst_h")
    h.isNaN shouldBe false
    // an R/S estimate from 3 block sizes is noisy but must stay in a sane band
    h should (be > -1.0 and be < 2.0)
  }

  test("q353: H is nonnegative, ties only shrink it back up, C in (0,1]") {
    val r = rows("q353_kruskal_wallis")
    r should have size 1
    val row = r.head
    row.getAs[Long]("k_groups") should be >= 2L
    val (h, c, hAdj) = (row.getAs[Double]("h_stat"), row.getAs[Double]("tie_c"),
      row.getAs[Double]("h_adj"))
    h should be >= 0.0
    c should (be > 0.0 and be <= 1.0)
    // tie correction divides by C <= 1, so H' >= H
    hAdj should be >= h - 1e-9
  }

  test("q354: JB is consistent with its own skewness/kurtosis components") {
    val r = rows("q354_jarque_bera")
    r should not be empty
    r.foreach { row =>
      val (n, sk, kx, jb) = (row.getAs[Long]("n_events"),
        row.getAs[Double]("skewness"), row.getAs[Double]("kurtosis_excess"),
        row.getAs[Double]("jb_stat"))
      jb should be >= 0.0
      // recompose from the ROUNDED components — must land within the
      // rounding envelope of the registered statistic
      val approx = n / 6.0 * (sk * sk + kx * kx / 4.0)
      math.abs(jb - approx) should be < n * 1e-5
      // excess kurtosis is bounded below by -2 for any distribution
      kx should be >= -2.0
    }
  }

  test("q355: the cumulative hazard is nondecreasing and risk sets shrink") {
    val r = rows("q355_nelson_aalen")
    r.size should be >= 3
    val hz = r.map(_.getAs[Double]("na_cumhaz"))
    hz.sliding(2).foreach { case Seq(a, b) => b should be >= a - 1e-9; case _ => }
    val risk = r.map(_.getAs[Long]("n_at_risk"))
    risk.sliding(2).foreach { case Seq(a, b) => b should be <= a; case _ => }
    r.foreach { row =>
      row.getAs[Long]("n_events") should be > 0L
      row.getAs[Long]("n_events") should be <= row.getAs[Long]("n_at_risk")
      row.getAs[Double]("na_se") should be >= 0.0
    }
  }

  test("q356: W1 drift is nonnegative and bounded by the length range") {
    val r = rows("q356_wasserstein_drift")
    r.size should be >= 2
    r.foreach { row =>
      val w = row.getAs[Double]("w1_chars")
      w should be >= 0.0
      // W1 against the pooled corpus can never exceed the support width
      w should be <= 600.0
      row.getAs[Long]("n_docs") should be > 0L
    }
    // at least one source must actually drift from the pooled mixture
    r.map(_.getAs[Double]("w1_chars")).max should be > 0.0
  }

  test("q357: Cramér's V is in [0,1] and chi2 is consistent with it") {
    val r = rows("q357_cramers_v")
    r should have size 1
    val row = r.head
    val (n, nr, nc) = (row.getAs[Long]("n_docs"),
      row.getAs[Long]("n_sources"), row.getAs[Long]("n_langs"))
    val (chi2, v) = (row.getAs[Double]("chi2"), row.getAs[Double]("cramers_v"))
    chi2 should be >= 0.0
    v should (be >= 0.0 and be <= 1.0)
    row.getAs[Long]("dof") shouldBe (nr - 1) * (nc - 1)
    // recompose V from chi2 within the rounding envelope
    val approx = math.sqrt(chi2 / (n.toDouble * math.min(nr - 1, nc - 1)))
    math.abs(v - approx) should be < 1e-5
  }

  test("q358: EWMA stays inside the data range and limits widen monotonically") {
    val r = rows("q358_ewma_chart")
    r.size should be >= 10
    val xs = r.map(_.getAs[Long]("n_events").toDouble)
    r.foreach { row =>
      row.getAs[Double]("ewma") should (be >= xs.min - 1e-9 and be <= xs.max + 1e-9)
      row.getAs[Double]("ucl") should be > row.getAs[Double]("lcl")
    }
    // the (1-(1-λ)^2t) startup factor makes the band nondecreasing in t
    val widths = r.map(row => row.getAs[Double]("ucl") - row.getAs[Double]("lcl"))
    widths.sliding(2).foreach { case Seq(a, b) => b should be >= a - 1e-9; case _ => }
  }

  test("q359: BH is a step-up rule — rejections are a prefix of the p-ranking") {
    val r = rows("q359_bh_fdr")
    r.size should be >= 100
    val m = r.head.getAs[Long]("n_tests")
    m shouldBe r.size.toLong
    // p is nondecreasing in rank, rejects form a prefix, BH >= Bonferroni
    r.map(_.getAs[Double]("p_value")).sliding(2).foreach {
      case Seq(a, b) => b should be >= a; case _ => ()
    }
    val flags = r.map(_.getAs[Long]("bh_reject"))
    flags.sliding(2).foreach { case Seq(a, b) => b should be <= a; case _ => () }
    r.foreach { row =>
      row.getAs[Double]("p_value") should (be >= 0.0 and be <= 1.0 + 1e-9)
      row.getAs[Long]("bonf_reject") should be <= row.getAs[Long]("bh_reject")
    }
  }

  test("q360: the isotonic fit is nondecreasing and mass-preserving") {
    val r = rows("q360_isotonic_fit")
    r.size should be >= 10
    val fit = r.map(_.getAs[Double]("iso_fit"))
    fit.sliding(2).foreach { case Seq(a, b) => b should be >= a - 1e-9; case _ => }
    // PAVA pools preserve the total: sum(fit) == sum(y) up to fp noise
    val sy = r.map(_.getAs[Double]("revenue")).sum
    math.abs(fit.sum - sy) should be < math.abs(sy) * 1e-9
    // the fit lives inside the data range
    val ys = r.map(_.getAs[Double]("revenue"))
    fit.head should be >= ys.min - 1e-6
    fit.last should be <= ys.max + 1e-6
  }

  test("q361: Granger runs both directions with finite, consistent stats") {
    val r = rows("q361_granger")
    r.map(_.getAs[String]("direction")).sorted shouldBe Seq("cnt_to_rev", "rev_to_cnt")
    r.foreach { row =>
      row.getAs[Long]("n") should be >= 10L
      val f = row.getAs[Double]("f_stat")
      // adding a regressor can only reduce RSS, so F >= 0
      f should be >= 0.0
      row.getAs[Long]("granger_flag") shouldBe (if (f > 3.87) 1L else 0L)
      row.getAs[Double]("beta_ar").isNaN shouldBe false
      row.getAs[Double]("beta_cross").isNaN shouldBe false
    }
  }

  test("q276: the CUSUM scan reports the 10 largest |S| days in order") {
    val r = rows("q276_cusum_changepoint")
    r.size should be <= 10
    val mags = r.map(row => math.abs(row.getAs[Double]("s_cusum")))
    mags.sliding(2).foreach { case Seq(a, b) => b should be <= a; case _ => }
  }
}
