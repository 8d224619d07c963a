package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-quality expectations + pipeline run accounting — the observability
  * surface the reference drives through Glue job-status polling and Slack
  * alerts (`airflow/dags/etl_api.py:40-46,178-196`), re-expressed as engine
  * queries: a declarative rule report a scheduler can gate on, instead of
  * out-of-band orchestration callbacks.
  *
  * Scale shape: every metric here is ONE aggregation pass with map-side
  * partials (count / count-distinct / conditional counts), unpivoted to a
  * fixed row-per-rule report — output cardinality is the rule count, never
  * the data's. The run report's per-stage counts reuse the flagship
  * pipeline's own frames, so the accounting can never drift from what the
  * pipeline actually computed. */
object Expectations extends QueryModule {

  /** One-pass expectation report over `orders` (q154): each rule emits
    * (rule, observed-ratio, threshold, passed). Rules follow the Deequ
    * taxonomy — completeness, uniqueness, range conformance, domain
    * membership. `passed` is BIGINT 0/1 so a scheduler (or a HAVING
    * clause) can gate a publish step on `min(passed) = 1`. */
  def orderExpectations(s: SparkSession, dir: String): DataFrame = {
    val m = Tables.read(s, dir, "orders").agg(
      count(lit(1)).as("n"),
      countDistinct(col("o_orderkey")).as("uniq_key"),
      count(col("o_custkey")).as("nn_cust"),
      count(when(col("o_totalprice") > 0 && col("o_totalprice") < 1000000, 1)).as("in_range"),
      count(when(col("o_orderstatus").isin("F", "O", "P"), 1)).as("in_domain"))
    // one row in `m`; stack unpivots to the fixed rule set (row-local)
    m.select(expr(
      """stack(4,
        |  'orderkey_unique',    CAST(uniq_key AS DOUBLE)  / n, 1.0d,
        |  'custkey_complete',   CAST(nn_cust AS DOUBLE)   / n, 1.0d,
        |  'totalprice_range',   CAST(in_range AS DOUBLE)  / n, 0.99d,
        |  'orderstatus_domain', CAST(in_domain AS DOUBLE) / n, 1.0d
        |) AS (rule, observed, threshold)""".stripMargin))
      .select(col("rule"), round(col("observed"), 6).as("observed"),
        col("threshold"),
        when(col("observed") >= col("threshold"), 1L).otherwise(0L).as("passed"))
      .orderBy(col("rule"))
  }

  /** Medallion run report (q155): per-stage row accounting of the flagship
    * q01 pipeline — rows in, rows out, rows dropped at every stage (scan →
    * null filter → key dedup → gold rollup). This is the "did the job do
    * what it always does" summary the reference posts to Slack; making it a
    * query means the numbers come from the SAME frames the pipeline
    * computes, and a run-over-run diff of this report is the cheapest
    * regression alarm a 100 TB pipeline has (row counts are one metadata-
    * light aggregation per stage, no payload shuffles). */
  def runReport(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val bronze = Tables.read(s, dir, "lineitem")
    val filtered = bronze.transform(Medallion.requireField("l_returnflag"))
    val deduped = filtered.transform(Medallion.dedupByKeyAgg(
      Seq("l_orderkey", "l_linenumber"),
      Seq("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"),
      keep = Some(Seq("l_returnflag"))))
    val gold = deduped
      .withColumn("status", when(col("l_extendedprice") > 30000, lit("High")).otherwise(lit("Low")))
      .groupBy(col("l_returnflag"), col("status")).agg(count(lit(1)).as("n_rows"))
    def cnt(df: DataFrame): DataFrame = df.agg(count(lit(1)).cast(LongType).as("c"))
    val b = cnt(bronze); val f = cnt(filtered); val d = cnt(deduped); val g = cnt(gold)
    def stage(ord: Long, name: String, in: DataFrame, out: DataFrame): DataFrame =
      in.select(col("c").as("rows_in"))
        .crossJoin(out.select(col("c").as("rows_out")))
        .select(lit(ord).as("stage_ord"), lit(name).as("stage"),
          col("rows_in"), col("rows_out"),
          (col("rows_in") - col("rows_out")).as("rows_dropped"))
    stage(1L, "null_filter", b, f)
      .unionByName(stage(2L, "key_dedup", f, d))
      .unionByName(stage(3L, "gold_rollup", d, g))
      .orderBy(col("stage_ord"))
  }

  /** k-anonymity / l-diversity audit (q159): the re-identification-risk
    * check run before a dataset (or a training corpus's metadata) is
    * released. Quasi-identifiers (nation, market segment) partition the
    * population; a group smaller than k re-identifies its members, and a
    * group whose sensitive attribute (account-balance band) takes fewer
    * than l distinct values leaks it even at size >= k. ONE aggregation
    * keyed on the QI columns (exact distinct rewrites to the two-phase
    * expand — no window, no collect), output cardinality = QI-combination
    * count, never the population's. */
  def kAnonymityAudit(s: SparkSession, dir: String, k: Int = 10, l: Int = 5): DataFrame = {
    val band = floor(col("c_acctbal") / 1000d).cast("long")
    Tables.read(s, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(band).as("l_diversity"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("n_rows"), col("l_diversity"),
        when(col("n_rows") < k, 1L).otherwise(0L).as("k_violation"),
        when(col("l_diversity") < l, 1L).otherwise(0L).as("l_violation"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  /** Benford first-digit audit (q161): the fraud/synthetic-data smell test —
    * the leading significant digit of naturally-occurring amounts follows
    * log10(1 + 1/d); a flat or spiked distribution flags fabricated or
    * truncated values (this fixture's near-uniform digits 1-4 are exactly
    * the signature the audit exists to surface). Digit extraction goes
    * through the DECIMAL-canonical string — `floor(log10(x))` arithmetic
    * sits on a libm boundary at powers of ten, where Spark and DuckDB can
    * legitimately disagree by one ulp; the first character of the decimal
    * rendering cannot. Row-local then one 9-row aggregation. */
  def benfordAudit(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.read(s, dir, "orders")
      .filter(col("o_totalprice") > 0)
      .select(substring(col("o_totalprice").cast(DecimalType(18, 2)).cast("string"), 1, 1)
        .cast("long").as("digit"))
    val tot = d.agg(count(lit(1)).as("n"))
    d.groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n_orders"),
        round(col("n_orders").cast("double") / col("n"), 6).as("share"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("benford_share"),
        round(col("n_orders").cast("double") / col("n")
          - log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("deviation"))
      .orderBy(col("digit"))
  }

  /** Differentially-private count release (q163): per-group counts with
    * Laplace(1/ε) noise, ε = 1 — the mechanism a curator applies before
    * publishing group-by statistics of a sensitive corpus. The noise is
    * DETERMINISTIC by design of the test surface: uniform u ∈ (0,1) derives
    * from the md5 of a versioned seed + group key (exact integer → exact
    * double, identical in any engine), then the Laplace inverse CDF
    * −sign(u−½)·ln(1−2|u−½|). Seeded noise makes the release replayable
    * and hence oracle-checkable; a production deployment would swap the
    * seed for per-release randomness and drop `true_n` from the output.
    * Row-local on a bounded rollup — one aggregation, no extra shuffle. */
  def dpCounts(s: SparkSession, dir: String): DataFrame = {
    val u = (conv(substring(md5(concat(lit("graft-dp-v1|"), col("event_type"))), 1, 8), 16, 10)
      .cast("long").cast("double") + lit(0.5)) / lit(4294967296.0)
    val noise = round(lit(-1.0) * when(u < 0.5, -1.0).otherwise(1.0)
      * log(lit(1.0) - lit(2.0) * abs(u - lit(0.5))), 6)
    Tables.read(s, dir, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("true_n"))
      .select(col("event_type"), col("true_n"), noise.as("noise"),
        round(col("true_n") + noise, 0).cast("long").as("dp_count"))
      .orderBy(col("event_type"))
  }

  /** Release gate (q164): the single-row "may this run publish?" answer —
    * the Slack/alerting decision the reference makes in orchestration
    * (`airflow/dags/etl_api.py:178-196`), folded into the engine: all
    * expectation rules must pass AND the pipeline must not have dropped
    * more than 5% of bronze rows end-to-end. One row, composed from the
    * SAME frames q154/q155 report, so the gate can never disagree with the
    * dashboards built on them. */
  def releaseGate(s: SparkSession, dir: String): DataFrame = {
    val rules = orderExpectations(s, dir)
      .agg(count(lit(1)).as("n_rules"), sum(col("passed")).cast("long").as("n_passed"))
    val stages = runReport(s, dir)
    val bronze = stages.filter(col("stage_ord") === 1L)
      .select(col("rows_in").as("bronze_rows"))
    val gold = stages.filter(col("stage_ord") === 2L)
      .select(col("rows_out").as("silver_rows"))
    rules.crossJoin(bronze).crossJoin(gold)
      .select(col("n_rules"), col("n_passed"), col("bronze_rows"), col("silver_rows"),
        round(lit(1.0) - col("silver_rows").cast("double") / col("bronze_rows"), 6)
          .as("drop_ratio"),
        when(col("n_passed") === col("n_rules")
          && col("silver_rows").cast("double") >= col("bronze_rows") * 0.95, 1L)
          .otherwise(0L).as("gate"))
  }

  /** Snapshot diff (q171): the data-ops audit between two versions of a
    * keyed entity table — per-customer state (latest order status + order
    * count) "as of day 10100" vs current, classified into added / removed
    * / changed / unchanged. This is the report a VersionedLayer time-travel
    * pair feeds a reviewer before a MERGE is trusted; here the two
    * snapshots derive from one table with a date predicate so the oracle
    * can replay it. Windows partition on the entity key; the diff itself
    * is two anti-joins + one inner join, all on that same key — one
    * shuffle partitioning reused across all four legs. */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    val o = Tables.read(s, dir, "orders")
    def state(df: DataFrame): DataFrame = {
      val byKey = Window.partitionBy(col("o_custkey"))
      val latest = byKey.orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      df.withColumn("rn", row_number().over(latest))
        .withColumn("n", count(lit(1)).over(byKey))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderstatus").as("st"), col("n"))
    }
    val a = state(o.filter(
      floor(col("o_orderdate").cast(LongType) / 86400L) < 10100L))
    val b = state(o)
    val added = b.join(a.select(col("o_custkey")), Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("added"))
    val removed = a.join(b.select(col("o_custkey")), Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("removed"))
    val j = a.select(col("o_custkey"), col("st").as("ast"), col("n").as("an"))
      .join(b.select(col("o_custkey"), col("st").as("bst"), col("n").as("bn")), "o_custkey")
    val changed = j.filter(col("ast") =!= col("bst") || col("an") =!= col("bn"))
      .agg(count(lit(1)).as("changed"))
    val unchanged = j.filter(col("ast") === col("bst") && col("an") === col("bn"))
      .agg(count(lit(1)).as("unchanged"))
    added.crossJoin(removed).crossJoin(changed).crossJoin(unchanged)
  }

  /** Referential-integrity audit (q179): orphaned children (lineitems whose
    * order key resolves to nothing) and childless parents, with rates —
    * the cross-table conformance check the single-table rule report (q154)
    * cannot express. Two anti-joins on the natural key (AQE broadcasts the
    * key-only side when small) + metadata-light counts; at 100 TB this is
    * the post-load gate that catches a partially-landed parent partition
    * before downstream joins silently drop rows. */
  def refIntegrity(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.read(s, dir, "lineitem")
    val od = Tables.read(s, dir, "orders")
    val orphan = li.join(od.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_lineitems"))
    val childless = od.join(li.select(col("l_orderkey")),
      col("o_orderkey") === col("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("childless_orders"))
    val tot = li.agg(count(lit(1)).as("n_lineitems"))
      .crossJoin(od.agg(count(lit(1)).as("n_orders")))
    orphan.crossJoin(childless).crossJoin(tot)
      .select(col("orphan_lineitems"), col("childless_orders"),
        col("n_lineitems"), col("n_orders"),
        round(col("orphan_lineitems").cast("double") / col("n_lineitems"), 6)
          .as("orphan_rate"),
        round(col("childless_orders").cast("double") / col("n_orders"), 6)
          .as("childless_rate"))
  }

  /** Two-sample Kolmogorov–Smirnov drift (q184): for every source pair,
    * the exact KS statistic (max CDF gap) of the length distribution —
    * the distribution-shape drift check PSI's fixed buckets smooth over.
    * Exact and distributed: per-pair pooled values group to distinct
    * points, one cumulative window per pair (partitioned on the pair key,
    * frame-ordered integer sums — engine-identical), then a max. Pair
    * cardinality is |sources|², a constant; the window partitions count
    * grows with it, never with the corpus. */
  def ksSourceDrift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val srcs = Tables.read(s, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val pairs = srcs.select(col("source").as("sa"), col("n").as("na"))
      .crossJoin(srcs.select(col("source").as("sb"), col("n").as("nb")))
      .filter(col("sa") < col("sb"))
    val v = Tables.read(s, dir, "documents").select(col("source"), col("n_chars").as("x"))
    val xsA = pairs.join(v.select(col("source").as("sa"), col("x")), "sa")
      .withColumn("is_a", lit(1L))
    val xsB = pairs.join(v.select(col("source").as("sb"), col("x")), "sb")
      .withColumn("is_a", lit(0L))
    val g = xsA.unionByName(xsB)
      .groupBy(col("sa"), col("sb"), col("na"), col("nb"), col("x"))
      .agg(sum(col("is_a")).as("ca"), sum(lit(1L) - col("is_a")).as("cb"))
    val w = Window.partitionBy(col("sa"), col("sb")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, 0)
    g.withColumn("cca", sum(col("ca")).over(w))
      .withColumn("ccb", sum(col("cb")).over(w))
      .groupBy(col("sa"), col("sb"), col("na"), col("nb"))
      .agg(round(max(abs(col("cca").cast("double") / col("na")
        - col("ccb").cast("double") / col("nb"))), 6).as("ks_stat"))
      .select(col("sa").as("src_a"), col("sb").as("src_b"), col("ks_stat"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Mann–Whitney rank-sum drift (q264): for every source pair, the
    * two-sample U test on the length distribution — the LOCATION-shift
    * companion to q184's KS (KS reacts to any CDF gap including shape;
    * U asks specifically "does one source run longer?", which is the
    * question a mixture rebalance actually acts on). Exact and
    * distributed via the distinct-value average-rank identity: pooled
    * values group to distinct points per pair, ONE cumulative window per
    * pair (partitioned on the pair key) assigns each tie group the rank
    * 2·cum_before + t + 1 in DOUBLED integer space — every intermediate
    * is an exact integer (decimal-summed so a 100 TB corpus can't
    * overflow), and both engines derive z from the same integers with
    * the same operand sequence. Tie-corrected normal approximation:
    * sigma² = na·nb/12 · ((N+1) − Σ(t³−t)/(N(N−1))). Pair cardinality is
    * |sources|², a constant — window partitions never grow with the
    * corpus. */
  def mannWhitneyDrift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val srcs = Tables.read(s, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val pairs = srcs.select(col("source").as("sa"), col("n").as("na"))
      .crossJoin(srcs.select(col("source").as("sb"), col("n").as("nb")))
      .filter(col("sa") < col("sb"))
    val v = Tables.read(s, dir, "documents").select(col("source"), col("n_chars").as("x"))
    val xsA = pairs.join(v.select(col("source").as("sa"), col("x")), "sa")
      .withColumn("is_a", lit(1L))
    val xsB = pairs.join(v.select(col("source").as("sb"), col("x")), "sb")
      .withColumn("is_a", lit(0L))
    val g = xsA.unionByName(xsB)
      .groupBy(col("sa"), col("sb"), col("na"), col("nb"), col("x"))
      .agg(sum(col("is_a")).as("ca"), sum(lit(1L) - col("is_a")).as("cb"))
      .withColumn("t", col("ca") + col("cb"))
    val w = Window.partitionBy(col("sa"), col("sb")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = g.withColumn("cc", sum(col("t")).over(w))
      .withColumn("avgrank2", lit(2L) * (col("cc") - col("t")) + col("t") + 1L)
    // operands cast to decimal BEFORE the multiply (q266 convention): a
    // Long-space ca·avgrank2 or t³ can overflow on a 100 TB corpus under
    // ANSI mode even though the decimal sum that follows cannot
    val td = col("t").cast(DecimalType(12, 0))
    val st = ranked.groupBy(col("sa"), col("sb"), col("na"), col("nb"))
      .agg(
        sum(col("ca").cast(DecimalType(18, 0))
            * col("avgrank2").cast(DecimalType(18, 0)))
          .cast("double").as("r2a"),
        sum(td * td * td - td)
          .cast("double").as("ties"))
    st.select(col("sa"), col("sb"), col("na"), col("nb"),
      ((col("r2a") - (col("na") * (col("na") + 1L)).cast("double")) / lit(2.0))
        .as("u_stat"),
      (col("na") + col("nb")).as("nn"), col("ties"))
      .select(col("sa").as("src_a"), col("sb").as("src_b"),
        col("na"), col("nb"), col("u_stat"),
        round((col("u_stat") - (col("na") * col("nb")).cast("double") / lit(2.0))
          / sqrt((col("na") * col("nb")).cast("double")
            * ((col("nn") + 1L).cast("double")
              - col("ties") / (col("nn").cast("double") * (col("nn") - 1L).cast("double")))
            / lit(12.0)), 6).as("z_stat"))
      .withColumn("drift_flag", when(abs(col("z_stat")) > 1.96, 1L).otherwise(0L))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Functional-dependency audit (q185): violation counts for declared
    * column dependencies — the candidate-key / denormalization-consistency
    * check a profiler runs before trusting a join key as stable. Each rule
    * is one aggregation (exact distinct per key, HAVING > 1) rolled to a
    * single count; unioned to a fixed row-per-rule report. */
  def fdAudit(s: SparkSession, dir: String): DataFrame = {
    def violations(name: String, df: DataFrame, key: String, dep: String): DataFrame =
      df.groupBy(col(key)).agg(countDistinct(col(dep)).as("nd"))
        .filter(col("nd") > 1)
        .agg(lit(name).as("fd"), count(lit(1)).as("n_violating_keys"))
    val oc = Tables.read(s, dir, "orders")
      .join(Tables.read(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
    // l_orderkey -> o_custkey over lineitem⋈orders can only be violated by an
    // o_orderkey that is duplicated in ORDERS with differing custkeys, so the
    // violating key set is computable from orders alone — no lineitem shuffle.
    // The joined-view semantics (key must occur in lineitem) are preserved by
    // a broadcast semi-join: violations are anomalies, so the violating-key
    // side is ~empty and safe to broadcast at any corpus scale.
    val violatingOrderKeys = Tables.read(s, dir, "orders")
      .groupBy(col("o_orderkey")).agg(countDistinct(col("o_custkey")).as("nd"))
      .filter(col("nd") > 1).select(col("o_orderkey"))
    val fd1 = Tables.read(s, dir, "lineitem").select(col("l_orderkey"))
      .join(broadcast(violatingOrderKeys),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .distinct()
      .agg(lit("l_orderkey->o_custkey").as("fd"),
        count(lit(1)).as("n_violating_keys"))
    fd1
      .unionByName(violations("o_custkey->c_nationkey", oc, "o_custkey", "c_nationkey"))
      .unionByName(violations("p_name->p_brand (within part)",
        Tables.read(s, dir, "part"), "p_name", "p_brand"))
      .orderBy(col("fd"))
  }

  /** Near-constant column detector (q187): per declared numeric column of
    * `lineitem` — distinct count, mean, sample sd, coefficient of
    * variation, and top-value share; a column that is one value in
    * disguise (n_distinct = 1 or top share > 0.99) is flagged as a
    * useless feature / suspicious load. One unpivoted scan + two bounded
    * aggregations; moments from decimal-exact sums via the sum-of-squares
    * identity so both engines execute the same operand sequence. */
  def lowVarianceAudit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val u = Tables.read(s, dir, "lineitem").select(expr(
      """stack(4,
        |  'l_quantity',      l_quantity,
        |  'l_discount',      l_discount,
        |  'l_tax',           l_tax,
        |  'l_extendedprice', l_extendedprice) AS (col_name, x)""".stripMargin))
    val m = u.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n"), countDistinct(col("x")).as("n_distinct"),
        sum(col("x").cast(DecimalType(18, 2))).cast("double").as("sx"),
        // 2-dp values: square IN decimal space — rounding extendedprice²
        // (~1e10, ulp 2e-6) at 6 dp is the q293 cross-engine boundary class
        sum(col("x").cast(DecimalType(18, 2)) * col("x").cast(DecimalType(18, 2)))
          .cast("double").as("sxx"))
      .select(col("col_name"), col("n"), col("n_distinct"),
        (col("sx") / col("n")).as("mean"),
        when(col("n") > 1,
          sqrt((col("sxx") - col("sx") * (col("sx") / col("n"))) / (col("n") - 1)))
          .as("sd"))
    val tv = u.groupBy(col("col_name"), col("x")).agg(count(lit(1)).as("c"))
      .groupBy(col("col_name")).agg(max(col("c")).as("top_n"))
    m.join(tv, "col_name")
      .select(col("col_name"), col("n"), col("n_distinct"),
        round(col("mean"), 6).as("mean"),
        round(col("sd"), 6).as("sd"),
        when(col("mean") =!= 0, round(col("sd") / abs(col("mean")), 6)).as("cv"),
        round(col("top_n").cast("double") / col("n"), 6).as("top_value_share"),
        when(col("n_distinct") === 1
          || col("top_n").cast("double") / col("n") > 0.99, 1L).otherwise(0L)
          .as("near_constant"))
      .orderBy(col("col_name"))
  }

  /** Split-conformal quality gate (q205) — a distribution-free admission
    * threshold with a coverage guarantee (Vovk et al., "Algorithmic Learning
    * in a Random World", 2005; the split/inductive form of Papadopoulos et
    * al. 2002): hold out a calibration slice (`doc_id % 7 == 0`, the q100
    * convention), set the cut `tau` at the k-th smallest calibration
    * quality score with `k = floor(alpha * (n_cal + 1))`, and admit test
    * documents scoring >= tau. Exchangeability then guarantees the admitted
    * fraction is >= 1 - alpha in expectation REGARDLESS of what the score
    * function is — the principled way to turn q31's heuristic quality score
    * into a gate with a stated false-rejection budget, instead of an
    * eyeballed threshold. Report: per-source admission counts on the test
    * slice, with tau pinned into every row so the oracle hash-gates the
    * threshold itself, not just the counts.
    *
    * Scale shape: ONE pass computes scores; the calibration order statistic
    * sorts only the calibration slice (a single-partition window over a
    * BOUNDED sample — at 100 TB the calibration set is capped by design, a
    * few thousand rows, exactly like every published conformal deployment;
    * the corpus itself is never globally sorted). tau is a 1-row broadcast
    * onto the test-side aggregation, which is a plain per-source grouped
    * count with map-side partials. */
  /** The 1-row calibration-threshold frame q205 and the streaming gate
    * (q212) share: tau = k-th smallest calibration quality score,
    * k = floor(alpha * (n_cal + 1)), clamped to >= 1 so a tiny calibration
    * slice degrades to "tau = min score" instead of an empty frame (and a
    * NoSuchElementException from the scalar fetch). */
  def conformalTauFrame(s: SparkSession, dir: String, alpha: Double = 0.1): DataFrame = {
    val cal = Tables.read(s, dir, "documents")
      .filter(col("doc_id") % 7 === 0)
      .select(TextAnalytics.qualityScore.as("q"))
    val nCal = cal.agg(count(lit(1)).as("n_cal"))
    // k-th smallest calibration score: the VALUE at rank k is deterministic
    // under ties regardless of tie order, but the window still orders on
    // (q) only to mirror the oracle exactly.
    val ranked = cal.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col("q")))
        .cast("long"))
    ranked.crossJoin(broadcast(nCal))
      .filter(col("rn") ===
        greatest(floor(lit(alpha) * (col("n_cal") + 1)).cast("long"), lit(1L)))
      .select(col("q").as("tau"))
  }

  /** [[conformalTauFrame]] as a scalar — the bounded model fetch the
    * streaming admission gate folds into its row-local predicate. */
  def conformalTau(s: SparkSession, dir: String, alpha: Double = 0.1): Double =
    conformalTauFrame(s, dir, alpha).collect().head.getDouble(0)

  def conformalGate(s: SparkSession, dir: String, alpha: Double = 0.1): DataFrame = {
    val scored = Tables.read(s, dir, "documents")
      .select(col("doc_id"), col("source"), TextAnalytics.qualityScore.as("q"))
    val tau = conformalTauFrame(s, dir, alpha)
    scored.filter(col("doc_id") % 7 =!= 0)
      .crossJoin(broadcast(tau))
      .groupBy(col("source"), col("tau"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("q") >= col("tau"), 1L).otherwise(0L)).as("n_admitted"))
      .select(col("source"), col("n_docs"), col("n_admitted"),
        round(col("n_admitted").cast("double") / col("n_docs"), 6).as("admit_rate"),
        col("tau"))
      .orderBy(col("source"))
  }

  /** Mutual-information association audit (q206) — MI in bits between the
    * corpus's categorical descriptors: (source, lang), (source, label) and
    * (lang, label), with `label` joined from the aligned embeddings table.
    * Chi-square (q142) answers "is there ANY dependence"; MI quantifies HOW
    * MUCH shared information the pair carries, which is the number a
    * mixture designer reads before stratifying on a column (a column pair
    * with near-zero MI doesn't need joint stratification) and a leakage
    * reviewer reads to spot a metadata column that secretly encodes the
    * training label. Emitted as H(X), H(Y), H(X,Y) and
    * MI = H(X) + H(Y) − H(X,Y), all from the SAME grouped counts so the
    * identity holds exactly on rounded values.
    *
    * Determinism: each entropy term p·log2(p) is computed as
    * log10(p)/log10(2) (both engines' log10 agree far past the 12 dp the
    * term is rounded to) and summed in DECIMAL space — order-independent,
    * the q73/q134 convention. Scale shape: one union'd pass over narrow
    * (pair, x, y) rows, three grouped counts with map-side partials;
    * output cardinality is the pair count, never the data's. */
  def miAssociation(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.read(s, dir, "documents")
      .join(Tables.read(s, dir, "embeddings").select(
        col("vec_id").as("doc_id"), col("label").cast("string").as("label")),
        Seq("doc_id"))
    val t = d.select(lit("src_lang").as("pair"), col("source").as("x"), col("lang").as("y"))
      .unionAll(d.select(lit("src_label").as("pair"), col("source").as("x"), col("label").as("y")))
      .unionAll(d.select(lit("lang_label").as("pair"), col("lang").as("x"), col("label").as("y")))
    val c2 = t.groupBy(col("pair"), col("x"), col("y")).agg(count(lit(1)).as("c"))
    val n = c2.groupBy(col("pair")).agg(sum(col("c")).as("n"))
    def entropy(keyed: DataFrame, cCol: String, out: String): DataFrame = {
      val p = keyed.join(n, Seq("pair"))
        .select(col("pair"),
          (col(cCol).cast("double") / col("n")).as("p"))
      p.groupBy(col("pair"))
        .agg(round(-sum(
          round(col("p") * log10(col("p")) / log10(lit(2.0)), 12)
            .cast(DecimalType(38, 12))).cast("double"), 6).as(out))
    }
    val hx = entropy(c2.groupBy(col("pair"), col("x")).agg(sum(col("c")).as("cx")), "cx", "h_x")
    val hy = entropy(c2.groupBy(col("pair"), col("y")).agg(sum(col("c")).as("cy")), "cy", "h_y")
    val hxy = entropy(c2, "c", "h_xy")
    hx.join(hy, Seq("pair")).join(hxy, Seq("pair"))
      .select(col("pair"), col("h_x"), col("h_y"), col("h_xy"),
        round(col("h_x") + col("h_y") - col("h_xy"), 6).as("mi_bits"))
      .orderBy(col("pair"))
  }

  /** One-way ANOVA F over a `(g, x)` frame whose x values are exact 6-dp
    * doubles: per-group and grand means in integer-space half-up (the q93
    * discipline — group counts are arbitrary, so a decimal-sum divided by
    * an even n can land on a TRUE tie), between/within sums of squares as
    * 9-dp pre-rounded decimal sums, one F and effect-size row out. Shared
    * by q318 (means) and q319 (Brown–Forsythe on |x − median|). */
  /** Public alias of [[anovaFrom]] for cross-module reuse (q321). */
  private[operators] def anovaOn(per: DataFrame): DataFrame = anovaFrom(per)

  private def anovaFrom(per: DataFrame): DataFrame = {
    val dec12 = DecimalType(38, 12)
    // x is exact at 6 dp, so x² is exact at 12 dp and the 9-dp group means
    // sit on the 1e-9 grid — every sum of squares below lives EXACTLY on
    // the 1e-18 grid and never touches a float until the final F: the
    // first draft rounded per-group w in double and struck a true 9-dp
    // tie at sf0.1 (ssw 23.743576 vs ...575). SSB/SSW report as 6-dp
    // integer-space half-up (nonnegative numerators, so Spark's
    // truncating div and DuckDB's flooring // agree).
    val g = per.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(DecimalType(38, 6))).as("sx"),
        expr("(2 * cast(sum(cast(x as decimal(38,6))) * 1000000000 as decimal(38,0))" +
          " + count(1)) div (2 * count(1))").as("mg9"),
        // x² in DECIMAL space ((18,6)² → exact (37,12)) — equals the 6-dp
        // value's exact 12-dp square AND survives large-magnitude x (a
        // double product at 1e11 can't carry 12 dp — the q232 lesson)
        sum(expr("cast(x as decimal(18,6)) * cast(x as decimal(18,6))")).as("s2"))
      .localCheckpoint()
    val st = g.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
      expr("(2 * cast(sum(sx) * 1000000000 as decimal(38,0)) + sum(n))" +
        " div (2 * sum(n))").as("m9"))
    val ss = g.crossJoin(broadcast(st))
      .select(
        // squares via decimal operands — a LONG mg9² overflows once the
        // group means leave [0, ~9] (revenue-scaled inputs)
        expr("cast(n as decimal(38,0)) * (cast(mg9 - m9 as decimal(19,0))" +
          " * cast(mg9 - m9 as decimal(19,0)))").as("b18"),
        expr("cast(s2 * 1000000000000 as decimal(38,0)) * 1000000" +
          " - cast(n as decimal(38,0)) * (cast(mg9 as decimal(19,0))" +
          " * cast(mg9 as decimal(19,0)))").as("w18"))
      .agg((expr("(2 * sum(b18) + 1000000000000) div 2000000000000")
          .cast("double") / 1e6).as("ssb"),
        (expr("(2 * sum(w18) + 1000000000000) div 2000000000000")
          .cast("double") / 1e6).as("ssw"))
    ss.crossJoin(broadcast(st))
      .select(col("k").as("n_groups"), col("nn").as("n_rows"), col("ssb"), col("ssw"),
        round((col("ssb") / (col("k") - lit(1L)))
          / (col("ssw") / (col("nn") - col("k"))), 6).as("f_stat"),
        round(col("ssb") / (col("ssb") + col("ssw")), 6).as("eta_sq"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q171_snapshot_diff" -> snapshotDiff,

    // Contingency drill-down (q329): the (source × lang) table with
    // independence-expected counts and Pearson standardized residuals —
    // q206's MI says THAT source and language associate; the residual
    // cells say WHERE (which source over/under-produces which language,
    // in sigma units — |r| > 2-3 flags the driving cells). Expected
    // counts are integer-space half-up (nr·nc/N is a small-denominator
    // rational — the true-tie class); the whole table is |sources|×|langs|
    // rows off one grouped count.
    "q329_residual_cells" -> ((s, dir) => {
      val ct = Tables.read(s, dir, "documents")
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("obs"))
        .localCheckpoint()
      val rs = ct.groupBy(col("source")).agg(sum(col("obs")).as("nr"))
      val cs = ct.groupBy(col("lang")).agg(sum(col("obs")).as("nc"))
      val nn = ct.agg(sum(col("obs")).as("n"))
      ct.join(rs, "source").join(cs, "lang").crossJoin(broadcast(nn))
        .select(col("source"), col("lang"), col("obs"),
          (expr("(2 * cast(nr as decimal(38,0)) * nc * 1000000 + n) div (2 * n)")
            .cast("double") / 1e6).as("expected"))
        .select(col("source"), col("lang"), col("obs"), col("expected"),
          round((col("obs") - col("expected")) / sqrt(col("expected")), 6)
            .as("std_residual"))
        .orderBy(col("source"), col("lang"))
    }),

    // Pairwise effect sizes (q343): Cohen's d (pooled-SD standardized mean
    // difference) with the Hedges small-sample correction for every source
    // pair — the magnitude readout q318's omnibus F doesn't give (an F can
    // be "significant" at corpus n while every pairwise difference is
    // negligible; mixture decisions need the d's, not the p). Means are
    // integer-space half-up; (n−1)·s² terms ride the exact 1e-18 grid
    // (q318's w18), so pooling is exact until the final sqrt/divide. The
    // pair stage is |sources|²-bounded.
    "q343_effect_sizes" -> ((s, dir) => {
      val g = Tables.read(s, dir, "documents")
        .select(col("source").as("g"), TextAnalytics.qualityScore.as("x"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          expr("(2 * cast(sum(cast(x as decimal(38,6))) * 1000000000 as decimal(38,0))" +
            " + count(1)) div (2 * count(1))").as("mg9"),
          sum(expr("cast(x as decimal(18,6)) * cast(x as decimal(18,6))")).as("s2"))
        .select(col("g"), col("n"), col("mg9"),
          expr("cast(s2 * 1000000000000 as decimal(38,0)) * 1000000" +
            " - cast(n as decimal(38,0)) * (cast(mg9 as decimal(19,0))" +
            " * cast(mg9 as decimal(19,0)))").as("w18"))
        .localCheckpoint()
      val a = g.select(col("g").as("src_a"), col("n").as("na"),
        col("mg9").as("ma9"), col("w18").as("wa"))
      val b = g.select(col("g").as("src_b"), col("n").as("nb"),
        col("mg9").as("mb9"), col("w18").as("wb"))
      a.join(b, col("src_a") < col("src_b"))
        .select(col("src_a"), col("src_b"), col("na"), col("nb"),
          round(sqrt(expr("cast(wa + wb as double)") / 1e18
            / (col("na") + col("nb") - lit(2L))), 9).as("sp"),
          ((col("ma9") - col("mb9")).cast("double") / 1e9).as("md"))
        .select(col("src_a"), col("src_b"), col("na"), col("nb"),
          round(col("md") / col("sp"), 6).as("cohen_d"))
        .select(col("src_a"), col("src_b"), col("na"), col("nb"), col("cohen_d"),
          round(col("cohen_d") * (lit(1.0)
            - lit(3.0) / (lit(4.0) * (col("na") + col("nb")) - lit(9.0))), 6)
            .as("hedges_g"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // One-way ANOVA across sources (q318): does mean quality differ by
    // source AT ALL, as one F test — the k-group gate run before burning
    // review budget on q283's per-source ablations or q264's pairwise
    // drifts (k(k−1)/2 pairwise tests without this omnibus is the classic
    // multiple-comparison trap). eta² = SSB/SST is the effect size. One
    // corpus pass to the per-source moment frame; everything after runs
    // on |sources| rows.
    "q318_anova_quality" -> ((s, dir) =>
      anovaFrom(Tables.read(s, dir, "documents")
        .select(col("source").as("g"), TextAnalytics.qualityScore.as("x")))),

    // Brown–Forsythe variance homogeneity (q319): the same ANOVA machinery
    // pointed at |x − median_g| — do sources differ in quality SPREAD, the
    // robust Levene variant (median-centered, so heavy tails don't fake a
    // result). Read WITH q318: equal means + unequal spreads is a mixture
    // of clean and noisy crawls that a mean-only audit calls homogeneous;
    // BF significance is also the formal caveat on q318's equal-variance
    // assumption. Medians via exact interpolated percentile (the q94
    // cross-engine-identical convention), broadcast back in one join.
    "q319_brown_forsythe" -> ((s, dir) => {
      val base = Tables.read(s, dir, "documents")
        .select(col("source"), TextAnalytics.qualityScore.as("q"))
      // median in INTEGER space: an even group's midpoint of two 6-dp
      // values is a true 7th-digit tie (struck at sf0.1) — percentile
      // over q·10⁶ yields an exact k or k.5 double, and floor(+0.5) is
      // the tie-unambiguous half-up both engines share
      val med = base
        .select(col("source"), round(col("q") * 1e6, 0).cast("long").as("q6"))
        .groupBy(col("source"))
        .agg(floor(expr("percentile(q6, 0.5D)") + lit(0.5)).cast("long").as("med6"))
      anovaFrom(base.join(broadcast(med), "source")
        .select(col("source").as("g"),
          round(abs(col("q") - col("med6").cast("double") / 1e6), 6).as("x")))
    }),
    "q205_conformal_gate" -> ((s, dir) => conformalGate(s, dir)),
    "q206_mi_association" -> miAssociation,

    // Kruskal–Wallis rank test (q353): does quality differ by source WITHOUT
    // q318's normality/equal-variance assumptions — the k-group extension of
    // q264's pairwise Mann-Whitney, run as the robustness check beside the
    // parametric ANOVA (q318 significant + q353 not = the F is a tail
    // artifact). Global average ranks come off the exact 6-dp quality GRID
    // via the q342 2·rank integer identity (grid cardinality is bounded by
    // the score range, corpus-size-independent); per-source rank sums, the
    // tie term and N stay pure integers, and H touches doubles only in the
    // final two divisions (textually identical both engines). H' = H/C
    // applies the tie correction — on a 6-dp grid ties are plentiful.
    "q353_kruskal_wallis" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.LongType
      val dd = Tables.read(s, dir, "documents")
        .select(col("source").as("g"),
          round(TextAnalytics.qualityScore * 1e6, 0).cast(LongType).as("b"))
        .localCheckpoint()
      val grid = dd.groupBy(col("b")).agg(count(lit(1)).as("c"))
      val wB = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)
      val ranks = grid
        .withColumn("cum_below", coalesce(sum(col("c")).over(wB), lit(0L)))
        .select(col("b"), (lit(2L) * col("cum_below") + col("c") + lit(1L)).as("ar2"))
      val ties = grid.agg(
        coalesce(sum(when(col("c") > 1,
          expr("cast(c as decimal(38,0)) * c * c - c"))), lit(0L).cast(DecimalType(38, 0)))
          .as("tie_t"),
        sum(col("c")).as("nn"))
      val srr = dd.join(ranks, "b")
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n_g"), sum(col("ar2")).as("w2"))
        .select(expr("cast(round(cast(cast(w2 as decimal(19,0)) * cast(w2 as decimal(19,0))" +
          " as double) / 4.0 / cast(n_g as double), 12) as decimal(38,12))").as("t12"))
        .agg(count(lit(1)).as("k_groups"), sum(col("t12")).as("srr"))
      srr.crossJoin(broadcast(ties))
        .select(col("nn").as("n_total"), col("k_groups"),
          expr("12.0 * cast(srr as double) / (cast(nn as double) * cast(nn + 1 as double))" +
            " - 3.0 * cast(nn + 1 as double)").as("h_raw"),
          expr("1.0 - cast(tie_t as double) / (cast(nn as double) * cast(nn as double)" +
            " * cast(nn as double) - cast(nn as double))").as("c_raw"))
        .select(col("n_total"), col("k_groups"),
          round(col("h_raw"), 6).as("h_stat"),
          round(col("c_raw"), 6).as("tie_c"),
          when(col("c_raw") > 0, round(col("h_raw") / col("c_raw"), 6)).as("h_adj"))
    }),

    // Wasserstein-1 length drift (q356): per source, the earth-mover's
    // distance between the source's n_chars distribution and the pooled
    // corpus — the INTEGRATED transport companion to q184's KS sup-norm
    // (KS fires on one bad quantile; W1 weighs how far ALL the mass moved,
    // which is what a mixture-rebalance cost actually is) and q264's U
    // (location only; W1 sees shape). W1 = Σ_grid |F_s−F_all|·Δb computed
    // ENTIRELY in integer space: |cum_s·N − cum_all·n_s|·Δb decimal-summed
    // over the bounded length grid (per-source windows over the replicated
    // grid — cum_all rides the same partitioned window, no global window),
    // one final half-up integer division. d_int ≤ n_s·N·range ~ 1e27 at
    // 1e12 docs — decimal(38)-safe; zero doubles anywhere.
    "q356_wasserstein_drift" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.read(s, dir, "documents").select(col("source"), col("n_chars").as("b"))
      val grid = d.groupBy(col("b")).agg(count(lit(1)).as("c_all")).localCheckpoint()
      val tot = d.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      val n = grid.agg(sum(col("c_all")).as("n_all"))
      val sg = tot.crossJoin(broadcast(grid))
        .join(d.groupBy(col("source"), col("b")).agg(count(lit(1)).as("c_s")),
          Seq("source", "b"), "left")
      val wS = Window.partitionBy(col("source")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = sg
        .withColumn("cum_s", sum(coalesce(col("c_s"), lit(0L))).over(wS))
        .withColumn("cum_all", sum(col("c_all")).over(wS))
        .withColumn("delta",
          lead(col("b"), 1).over(Window.partitionBy(col("source")).orderBy(col("b")))
            - col("b"))
      cum.filter(col("delta").isNotNull)
        .crossJoin(broadcast(n))
        .groupBy(col("source"), col("n_s"), col("n_all"))
        .agg(sum(expr("abs(cast(cum_s as decimal(38,0)) * n_all" +
          " - cast(cum_all as decimal(38,0)) * n_s) * delta")).as("d_int"))
        .select(col("source"), col("n_s").as("n_docs"),
          (expr("(2 * d_int * 1000000 + cast(n_s as decimal(38,0)) * n_all)" +
            " div (2 * cast(n_s as decimal(38,0)) * n_all)").cast("double") / 1e6)
            .as("w1_chars"))
        .orderBy(col("source"))
    }),

    // Cramér's V (q357): the normalized-chi-square association between
    // source and lang — "how much does knowing the crawl source pin down
    // the language", on a 0..1 scale comparable across table sizes, where
    // q206's mutual information is in data-dependent nats. V ≈ 0 clears a
    // stratified sampler to treat the axes independently; V near 1 means
    // per-source language quotas are redundant. Observed/marginal counts
    // are one grouped pass; everything after lives on the zero-filled
    // |sources|×|langs| grid (bounded, corpus-independent). Deviations
    // O·n − r·c stay exact decimal integers (≤ n² ~ 1e24, decimal-safe);
    // each cell's chi² term is squared in double, 12-dp pre-rounded and
    // decimal-summed so the fold is order-exact.
    "q357_cramers_v" -> ((s, dir) => {
      val o = Tables.read(s, dir, "documents")
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("o"))
        .localCheckpoint()
      val r = o.groupBy(col("source")).agg(sum(col("o")).as("r"))
      val c = o.groupBy(col("lang")).agg(sum(col("o")).as("cc"))
      val n = o.agg(sum(col("o")).as("n"),
        countDistinct(col("source")).as("nr"), countDistinct(col("lang")).as("nc"))
      val grid = r.crossJoin(c)
        .join(o, Seq("source", "lang"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
      grid.crossJoin(broadcast(n))
        .select(col("nr"), col("nc"), col("n"),
          expr("cast(round(cast(cast(o as decimal(38,0)) * n - cast(r as decimal(38,0)) * cc" +
            " as double) * cast(cast(o as decimal(38,0)) * n - cast(r as decimal(38,0)) * cc" +
            " as double) / (cast(n as double) * cast(r as double) * cast(cc as double)), 12)" +
            " as decimal(38,12))").as("t12"))
        .groupBy(col("nr"), col("nc"), col("n"))
        .agg(sum(col("t12")).as("chi2d"))
        .select(col("n").as("n_docs"), col("nr").as("n_sources"), col("nc").as("n_langs"),
          ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
          round(col("chi2d").cast("double"), 6).as("chi2"),
          round(sqrt(col("chi2d").cast("double") /
            (col("n").cast("double") * least(col("nr") - 1, col("nc") - 1).cast("double"))), 6)
            .as("cramers_v"))
    }),

    // Benjamini–Hochberg FDR (q359): turn q264's pairwise Mann-Whitney z's
    // into a DECISION set with controlled false-discovery rate — the
    // missing multiple-testing layer over every pairwise drift monitor
    // here (|sources|²/2 tests at α=.05 expect ~5% false alarms under the
    // null; BH caps the expected false FRACTION of the rejected set
    // instead, Bonferroni rides along as the conservative floor). Two-
    // sided p's come from the Abramowitz–Stegun 7.1.26 erfc polynomial in
    // ONE shared SQL string (textually identical double arithmetic both
    // engines, 12-dp pre-round absorbing libm exp() ulp skew); the step-up
    // rank scan is a window + max over the bounded pair frame — nothing
    // here ever touches the corpus again.
    "q359_bh_fdr" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val z = mannWhitneyDrift(s, dir)
        .select(col("src_a"), col("src_b"), col("z_stat"))
        .withColumn("az", abs(col("z_stat")))
        .withColumn("p_value", expr(NormTwoSidedPSql))
      val ranked = z.withColumn("p_rank",
        row_number().over(Window.orderBy(col("p_value"), col("src_a"), col("src_b")))
          .cast("long"))
      val m = ranked.agg(count(lit(1)).as("m"))
      val flagged = ranked.crossJoin(broadcast(m))
        .withColumn("passes",
          when(col("p_value") * col("m").cast("double")
            <= col("p_rank").cast("double") * lit(0.05), lit(1L)).otherwise(lit(0L)))
      val kstar = flagged
        .agg(coalesce(max(when(col("passes") === 1L, col("p_rank"))), lit(0L)).as("kstar"))
      flagged.crossJoin(broadcast(kstar))
        .select(col("src_a"), col("src_b"), col("z_stat"), col("p_value"),
          col("p_rank"), col("m").as("n_tests"),
          when(col("p_rank") <= col("kstar"), lit(1L)).otherwise(lit(0L)).as("bh_reject"),
          when(col("p_value") * col("m").cast("double") <= lit(0.05), lit(1L))
            .otherwise(lit(0L)).as("bonf_reject"))
        .orderBy(col("p_rank"))
    }),

    // Conformal-threshold stability (q230): tau re-fit per ingest batch
    // (doc_id % 10 — each batch's own calibration order statistic at the
    // same alpha = 0.1) with the drift against the standing q205 tau. A
    // conformal deployment re-fits its threshold on the calibration
    // cadence; a tau that whipsaws batch-to-batch means the quality-score
    // distribution is unstable and the gate's coverage guarantee is being
    // spent on distribution shift, not noise — re-fit faster or fix
    // upstream. The per-batch order statistic ranks WITHIN the batch
    // (partition-parallel window, never a global sort); the standing tau
    // broadcasts as one row.
    "q230_tau_stability" -> ((s, dir) => {
      val scored = Tables.read(s, dir, "documents")
        .select((col("doc_id") % 10).as("batch"), TextAnalytics.qualityScore.as("q"))
      val n = scored.groupBy(col("batch")).agg(count(lit(1)).as("n_cal"))
      val ranked = scored.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("batch"))
          .orderBy(col("q"))).cast("long"))
      val tauB = ranked.join(n, Seq("batch"))
        .filter(col("rn") ===
          greatest(floor(lit(0.1) * (col("n_cal") + 1)).cast("long"), lit(1L)))
        .select(col("batch"), col("n_cal"), col("q").as("tau_batch"))
      tauB.crossJoin(broadcast(conformalTauFrame(s, dir)))
        .select(col("batch"), col("n_cal"), col("tau_batch"), col("tau").as("tau_standing"),
          round(col("tau_batch") - col("tau"), 6).as("tau_drift"))
        .orderBy(col("batch"))
    }),
    "q179_ref_integrity" -> refIntegrity,
    "q184_ks_source_drift" -> ksSourceDrift,
    "q264_mann_whitney" -> mannWhitneyDrift,
    "q185_fd_audit" -> fdAudit,
    "q187_low_variance" -> lowVarianceAudit,
    "q154_data_expectations" -> orderExpectations,
    "q155_run_report" -> runReport,
    "q159_k_anonymity" -> ((s, dir) => kAnonymityAudit(s, dir)),
    "q161_benford_audit" -> benfordAudit,
    "q163_dp_counts" -> dpCounts,
    "q164_release_gate" -> releaseGate,
    // Fixture fingerprint (q193): the per-table data-envelope guard the
    // round-11 timestamp-unit drift showed was missing — see
    // [[graft.sources.FixtureCheck]]. Oracled: DuckDB recomputes the same
    // envelope from the same files, so a reader-side unit misread surfaces
    // as a hash mismatch HERE, with the table named, before it can corrupt
    // 31 downstream queries.
    "q193_fixture_fingerprint" ->
      ((s, dir) => graft.sources.FixtureCheck.fingerprintFrame(s, dir))
  )

  /** Conformal score + threshold CTEs (`s` scored docs, `tau`) — shared
    * verbatim by the q205 oracle and the q212 streaming-gate oracle. */
  private[graft] val conformalTauSql: String =
    """WITH s AS (SELECT doc_id, source,
      |             round(0.5 * least(1.0, length(text) / 500.0)
      |                 + 0.3 * (CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to|is)\b')) AS DOUBLE) /
      |                          len(string_split(trim(text), ' ')))
      |                 + 0.2 * (1.0 - CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) /
      |                          length(text)), 6) AS q
      |           FROM documents),
      |cal AS (SELECT q FROM s WHERE doc_id % 7 = 0),
      |n AS (SELECT count(*) AS n_cal FROM cal),
      |r AS (SELECT q, row_number() OVER (ORDER BY q) AS rn FROM cal),
      |tau AS (SELECT q AS tau FROM r CROSS JOIN n
      |        WHERE rn = greatest(CAST(floor(0.1 * (n_cal + 1)) AS BIGINT), 1))""".stripMargin

  /** SQL mirror of [[anovaFrom]]; `perCte` must end in `per(g, x)`.
    * Exposed to sibling modules for queries built on the ANOVA layer. */
  private[operators] def anovaSqlOn(perCte: String): String = anovaSql(perCte)

  private def anovaSql(perCte: String): String =
    perCte + """,
      |g AS (SELECT g, count(*) AS n,
      |        sum(CAST(x AS DECIMAL(38,6))) AS sx,
      |        (2 * CAST(CAST(sum(CAST(x AS DECIMAL(38,6))) * 1000000000 AS DECIMAL(38,0)) AS HUGEINT)
      |         + count(*)) // (2 * count(*)) AS mg9,
      |        sum(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))) AS s2
      |      FROM per GROUP BY 1),
      |st AS (SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nn,
      |         (2 * CAST(CAST(sum(sx) * 1000000000 AS DECIMAL(38,0)) AS HUGEINT)
      |          + sum(n)) // (2 * sum(n)) AS m9
      |       FROM g),
      |parts AS (SELECT CAST(n AS HUGEINT) * (CAST(mg9 - m9 AS HUGEINT) * CAST(mg9 - m9 AS HUGEINT)) AS b18,
      |            CAST(s2 * 1000000000000 AS HUGEINT) * 1000000
      |            - CAST(n AS HUGEINT) * (CAST(mg9 AS HUGEINT) * CAST(mg9 AS HUGEINT)) AS w18
      |          FROM g CROSS JOIN st),
      |ss AS (SELECT CAST((2 * sum(b18) + 1000000000000) // 2000000000000 AS DOUBLE) / 1e6 AS ssb,
      |         CAST((2 * sum(w18) + 1000000000000) // 2000000000000 AS DOUBLE) / 1e6 AS ssw
      |       FROM parts)
      |SELECT st.k AS n_groups, st.nn AS n_rows, ssb, ssw,
      |       round((ssb / (st.k - 1)) / (ssw / (st.nn - st.k)), 6) AS f_stat,
      |       round(ssb / (ssb + ssw), 6) AS eta_sq
      |FROM ss CROSS JOIN st""".stripMargin

  private val qualityExprSql: String =
    """round(0.5 * least(1.0, length(text) / 500.0)
      |    + 0.3 * (CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to|is)\b')) AS DOUBLE) /
      |             len(string_split(trim(text), ' ')))
      |    + 0.2 * (1.0 - CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) /
      |             length(text)), 6)""".stripMargin

  /** Two-sided normal p-value from `az` = |z| via the Abramowitz–Stegun
    * 7.1.26 erfc polynomial (|err| < 1.5e-7) — ONE shared SQL string so both
    * engines evaluate bit-identical double arithmetic; the 12-dp pre-round
    * absorbs libm exp() ulp skew between JVM and DuckDB. */
  private[operators] val NormTwoSidedPSql: String = {
    val x = "(az / 1.4142135623730951)"
    val t = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"round(((((1.061405429 * $t - 1.453152027) * $t + 1.421413741) * $t" +
      s" - 0.284496736) * $t + 0.254829592) * $t * exp(-$x * $x), 12)"
  }

  /** The q264 Mann-Whitney oracle CTE chain up through `z` (src_a, src_b,
    * na, nb, u_stat, z_stat) — shared verbatim by the q264 oracle and the
    * q359 BH-FDR oracle so their z's can never drift apart. */
  private val mannWhitneyZCteSql: String =
    """WITH srcs AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
      |pairs AS (SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
      |          FROM srcs a JOIN srcs b ON a.source < b.source),
      |xs AS (SELECT p.sa, p.sb, p.na, p.nb, d.source AS src, d.n_chars AS x
      |       FROM pairs p JOIN documents d ON d.source IN (p.sa, p.sb)),
      |g AS (SELECT sa, sb, na, nb, x,
      |        sum(CASE WHEN src = sa THEN 1 ELSE 0 END) AS ca,
      |        sum(CASE WHEN src = sb THEN 1 ELSE 0 END) AS cb,
      |        count(*) AS t
      |      FROM xs GROUP BY 1, 2, 3, 4, 5),
      |r AS (SELECT *, sum(t) OVER (PARTITION BY sa, sb ORDER BY x
      |                             ROWS UNBOUNDED PRECEDING) AS cc
      |      FROM g),
      |st AS (SELECT sa, sb, na, nb,
      |         CAST(sum(CAST(ca AS DECIMAL(18,0))
      |                  * CAST(2 * (cc - t) + t + 1 AS DECIMAL(18,0))) AS DOUBLE) AS r2a,
      |         CAST(sum(CAST(t AS DECIMAL(12,0)) * CAST(t AS DECIMAL(12,0))
      |                  * CAST(t AS DECIMAL(12,0)) - CAST(t AS DECIMAL(12,0))) AS DOUBLE) AS ties
      |       FROM r GROUP BY 1, 2, 3, 4),
      |u AS (SELECT sa, sb, na, nb, ties, na + nb AS nn,
      |        (r2a - CAST(na * (na + 1) AS DOUBLE)) / 2.0 AS u_stat
      |      FROM st),
      |z AS (SELECT sa AS src_a, sb AS src_b, na, nb, u_stat,
      |        round((u_stat - CAST(na * nb AS DOUBLE) / 2.0)
      |              / sqrt(CAST(na * nb AS DOUBLE)
      |                     * (CAST(nn + 1 AS DOUBLE)
      |                        - ties / (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE)))
      |                     / 12.0), 6) AS z_stat
      |      FROM u)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q343_effect_sizes" ->
      s"""WITH per AS (SELECT source AS g, $qualityExprSql AS x FROM documents),
         |gg AS (SELECT g, count(*) AS n,
         |         (2 * CAST(CAST(sum(CAST(x AS DECIMAL(38,6))) * 1000000000 AS DECIMAL(38,0)) AS HUGEINT)
         |          + count(*)) // (2 * count(*)) AS mg9,
         |         sum(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))) AS s2
         |       FROM per GROUP BY 1),
         |gw AS (SELECT g, n, mg9,
         |         CAST(s2 * 1000000000000 AS HUGEINT) * 1000000
         |         - CAST(n AS HUGEINT) * (CAST(mg9 AS HUGEINT) * CAST(mg9 AS HUGEINT)) AS w18
         |       FROM gg),
         |p AS (SELECT a.g AS src_a, b.g AS src_b, a.n AS na, b.n AS nb,
         |        round(sqrt(CAST(a.w18 + b.w18 AS DOUBLE) / 1e18 / (a.n + b.n - 2)), 9) AS sp,
         |        CAST(a.mg9 - b.mg9 AS DOUBLE) / 1e9 AS md
         |      FROM gw a JOIN gw b ON a.g < b.g),
         |d AS (SELECT src_a, src_b, na, nb, round(md / sp, 6) AS cohen_d FROM p)
         |SELECT src_a, src_b, na, nb, cohen_d,
         |       round(cohen_d * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0)), 6) AS hedges_g
         |FROM d ORDER BY src_a, src_b""".stripMargin,
    "q329_residual_cells" ->
      """WITH ct AS (SELECT source, lang, count(*) AS obs FROM documents GROUP BY 1, 2),
        |rs AS (SELECT source, CAST(sum(obs) AS BIGINT) AS nr FROM ct GROUP BY 1),
        |cs AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS nc FROM ct GROUP BY 1),
        |nn AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM ct),
        |x AS (SELECT ct.source, ct.lang, ct.obs,
        |        CAST((2 * CAST(nr AS HUGEINT) * nc * 1000000 + n) // (2 * n) AS DOUBLE) / 1e6 AS expected
        |      FROM ct JOIN rs USING (source) JOIN cs USING (lang) CROSS JOIN nn)
        |SELECT source, lang, obs, expected,
        |       round((obs - expected) / sqrt(expected), 6) AS std_residual
        |FROM x ORDER BY source, lang""".stripMargin,
    "q318_anova_quality" ->
      anovaSql(s"""WITH per AS (SELECT source AS g, $qualityExprSql AS x FROM documents)"""),
    "q353_kruskal_wallis" ->
      s"""WITH dd AS (SELECT source AS g, CAST(round(q * 1000000, 0) AS BIGINT) AS b
         |            FROM (SELECT source, $qualityExprSql AS q FROM documents)),
         |grid AS (SELECT b, count(*) AS c FROM dd GROUP BY 1),
         |ranks AS (SELECT b,
         |            2 * coalesce(sum(c) OVER (ORDER BY b
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS ar2
         |          FROM grid),
         |ties AS (SELECT CAST(coalesce(sum(CASE WHEN c > 1
         |                  THEN CAST(c AS HUGEINT) * c * c - c END), 0) AS HUGEINT) AS tie_t,
         |           CAST(sum(c) AS BIGINT) AS nn
         |         FROM grid),
         |gr AS (SELECT g, count(*) AS n_g, CAST(sum(ar2) AS BIGINT) AS w2
         |       FROM dd JOIN ranks USING (b) GROUP BY 1),
         |srr AS (SELECT count(*) AS k_groups,
         |          sum(CAST(round(CAST(CAST(w2 AS DECIMAL(19,0)) * CAST(w2 AS DECIMAL(19,0))
         |                AS DOUBLE) / 4.0 / CAST(n_g AS DOUBLE), 12) AS DECIMAL(38,12))) AS srr
         |        FROM gr),
         |fin AS (SELECT nn, k_groups,
         |          12.0 * CAST(srr AS DOUBLE) / (CAST(nn AS DOUBLE) * CAST(nn + 1 AS DOUBLE))
         |            - 3.0 * CAST(nn + 1 AS DOUBLE) AS h_raw,
         |          1.0 - CAST(tie_t AS DOUBLE) / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
         |            * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE)) AS c_raw
         |        FROM srr CROSS JOIN ties)
         |SELECT nn AS n_total, k_groups, round(h_raw, 6) AS h_stat, round(c_raw, 6) AS tie_c,
         |       CASE WHEN c_raw > 0 THEN round(h_raw / c_raw, 6) END AS h_adj
         |FROM fin""".stripMargin,
    "q356_wasserstein_drift" ->
      """WITH d AS (SELECT source, n_chars AS b FROM documents),
        |grid AS (SELECT b, count(*) AS c_all FROM d GROUP BY 1),
        |tot AS (SELECT source, count(*) AS n_s FROM d GROUP BY 1),
        |n AS (SELECT CAST(sum(c_all) AS BIGINT) AS n_all FROM grid),
        |sc AS (SELECT source, b, count(*) AS c_s FROM d GROUP BY 1, 2),
        |sg AS (SELECT t.source, t.n_s, g.b, g.c_all, coalesce(sc.c_s, 0) AS c_s
        |       FROM tot t CROSS JOIN grid g
        |       LEFT JOIN sc ON sc.source = t.source AND sc.b = g.b),
        |cum AS (SELECT source, n_s, b,
        |          sum(c_s) OVER w AS cum_s, sum(c_all) OVER w AS cum_all,
        |          lead(b) OVER (PARTITION BY source ORDER BY b) - b AS delta
        |        FROM sg WINDOW w AS (PARTITION BY source ORDER BY b
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |agg AS (SELECT source, n_s, n_all,
        |          sum(abs(CAST(cum_s AS HUGEINT) * n_all
        |                - CAST(cum_all AS HUGEINT) * n_s) * delta) AS d_int
        |        FROM cum CROSS JOIN n WHERE delta IS NOT NULL GROUP BY 1, 2, 3)
        |SELECT source, n_s AS n_docs,
        |       CAST((2 * d_int * 1000000 + CAST(n_s AS HUGEINT) * n_all)
        |            // (2 * CAST(n_s AS HUGEINT) * n_all) AS DOUBLE) / 1e6 AS w1_chars
        |FROM agg ORDER BY source""".stripMargin,
    "q357_cramers_v" ->
      """WITH o AS (SELECT source, lang, count(*) AS o FROM documents GROUP BY 1, 2),
        |r AS (SELECT source, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY 1),
        |c AS (SELECT lang, CAST(sum(o) AS BIGINT) AS cc FROM o GROUP BY 1),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS n, count(DISTINCT source) AS nr,
        |             count(DISTINCT lang) AS nc FROM o),
        |grid AS (SELECT r.source, c.lang, r.r, c.cc, coalesce(o.o, 0) AS o
        |         FROM r CROSS JOIN c
        |         LEFT JOIN o ON o.source = r.source AND o.lang = c.lang),
        |terms AS (SELECT nr, nc, n,
        |            CAST(round(
        |              CAST(CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * cc AS DOUBLE)
        |              * CAST(CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * cc AS DOUBLE)
        |              / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(cc AS DOUBLE)), 12)
        |              AS DECIMAL(38,12)) AS t12
        |          FROM grid CROSS JOIN n),
        |agg AS (SELECT nr, nc, n, sum(t12) AS chi2d FROM terms GROUP BY 1, 2, 3)
        |SELECT n AS n_docs, nr AS n_sources, nc AS n_langs,
        |       (nr - 1) * (nc - 1) AS dof,
        |       round(CAST(chi2d AS DOUBLE), 6) AS chi2,
        |       round(sqrt(CAST(chi2d AS DOUBLE)
        |         / (CAST(n AS DOUBLE) * least(nr - 1, nc - 1))), 6) AS cramers_v
        |FROM agg""".stripMargin,
    "q319_brown_forsythe" ->
      anovaSql(
        s"""WITH base AS (SELECT source, $qualityExprSql AS q FROM documents),
           |medt AS (SELECT source,
           |           CAST(floor(percentile_cont(0.5) WITHIN GROUP (
           |                  ORDER BY CAST(round(q * 1000000, 0) AS BIGINT)) + 0.5) AS BIGINT) AS med6
           |         FROM base GROUP BY 1),
           |per AS (SELECT source AS g,
           |          round(abs(q - CAST(med6 AS DOUBLE) / 1e6), 6) AS x
           |        FROM base JOIN medt USING (source))""".stripMargin),
    "q230_tau_stability" ->
      (conformalTauSql +
        """,
          |sb AS (SELECT doc_id % 10 AS batch, q FROM s),
          |nb AS (SELECT batch, count(*) AS n_cal FROM sb GROUP BY 1),
          |rb AS (SELECT batch, q, row_number() OVER (PARTITION BY batch ORDER BY q) AS rn FROM sb),
          |tb AS (SELECT rb.batch, nb.n_cal, rb.q AS tau_batch
          |       FROM rb JOIN nb USING (batch)
          |       WHERE rn = greatest(CAST(floor(0.1 * (n_cal + 1)) AS BIGINT), 1))
          |SELECT batch, n_cal, tau_batch, tau AS tau_standing,
          |       round(tau_batch - tau, 6) AS tau_drift
          |FROM tb CROSS JOIN tau ORDER BY batch""".stripMargin),
    "q206_mi_association" ->
      """WITH d AS (SELECT source, lang, CAST(label AS VARCHAR) AS label
        |           FROM documents JOIN embeddings ON vec_id = doc_id),
        |t AS (SELECT 'src_lang' AS pair, source AS x, lang AS y FROM d
        |      UNION ALL SELECT 'src_label', source, label FROM d
        |      UNION ALL SELECT 'lang_label', lang, label FROM d),
        |c2 AS (SELECT pair, x, y, count(*) AS c FROM t GROUP BY 1, 2, 3),
        |n AS (SELECT pair, sum(c) AS n FROM c2 GROUP BY 1),
        |cx AS (SELECT pair, x, sum(c) AS cx FROM c2 GROUP BY 1, 2),
        |cy AS (SELECT pair, y, sum(c) AS cy FROM c2 GROUP BY 1, 2),
        |hx AS (SELECT pair, round(-CAST(sum(CAST(round(CAST(cx AS DOUBLE)/n * log10(CAST(cx AS DOUBLE)/n) / log10(2.0), 12) AS DECIMAL(38,12))) AS DOUBLE), 6) AS h_x
        |       FROM cx JOIN n USING (pair) GROUP BY pair),
        |hy AS (SELECT pair, round(-CAST(sum(CAST(round(CAST(cy AS DOUBLE)/n * log10(CAST(cy AS DOUBLE)/n) / log10(2.0), 12) AS DECIMAL(38,12))) AS DOUBLE), 6) AS h_y
        |       FROM cy JOIN n USING (pair) GROUP BY pair),
        |hxy AS (SELECT pair, round(-CAST(sum(CAST(round(CAST(c AS DOUBLE)/n * log10(CAST(c AS DOUBLE)/n) / log10(2.0), 12) AS DECIMAL(38,12))) AS DOUBLE), 6) AS h_xy
        |        FROM c2 JOIN n USING (pair) GROUP BY pair)
        |SELECT pair, h_x, h_y, h_xy, round(h_x + h_y - h_xy, 6) AS mi_bits
        |FROM hx JOIN hy USING (pair) JOIN hxy USING (pair) ORDER BY pair""".stripMargin,
    "q205_conformal_gate" ->
      (conformalTauSql +
      """
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN q >= tau THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
        |       round(CAST(sum(CASE WHEN q >= tau THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS admit_rate,
        |       tau
        |FROM (SELECT source, q FROM s WHERE doc_id % 7 != 0) CROSS JOIN tau
        |GROUP BY source, tau ORDER BY source""".stripMargin),
    "q193_fixture_fingerprint" ->
      """WITH f AS (
        |  SELECT 'region' AS tbl, count(*) AS n_rows,
        |         CAST(min(r_regionkey) AS DOUBLE) AS key_lo, CAST(max(r_regionkey) AS DOUBLE) AS key_hi,
        |         CAST(CASE WHEN count(*) > 0 AND min(r_regionkey) >= 0 THEN 1 ELSE 0 END AS BIGINT) AS sane
        |  FROM region
        |  UNION ALL SELECT 'nation', count(*), CAST(min(n_nationkey) AS DOUBLE), CAST(max(n_nationkey) AS DOUBLE),
        |         CAST(CASE WHEN count(*) > 0 AND min(n_nationkey) >= 0 THEN 1 ELSE 0 END AS BIGINT) FROM nation
        |  UNION ALL SELECT 'supplier', count(*), CAST(min(s_suppkey) AS DOUBLE), CAST(max(s_suppkey) AS DOUBLE),
        |         CAST(CASE WHEN count(*) > 0 AND min(s_suppkey) >= 0 THEN 1 ELSE 0 END AS BIGINT) FROM supplier
        |  UNION ALL SELECT 'customer', count(*), CAST(min(c_custkey) AS DOUBLE), CAST(max(c_custkey) AS DOUBLE),
        |         CAST(CASE WHEN count(*) > 0 AND min(c_custkey) >= 0 THEN 1 ELSE 0 END AS BIGINT) FROM customer
        |  UNION ALL SELECT 'part', count(*), CAST(min(p_partkey) AS DOUBLE), CAST(max(p_partkey) AS DOUBLE),
        |         CAST(CASE WHEN count(*) > 0 AND min(p_partkey) >= 0 THEN 1 ELSE 0 END AS BIGINT) FROM part
        |  UNION ALL SELECT 'orders', count(*), floor(epoch(min(o_orderdate))), floor(epoch(max(o_orderdate))),
        |         CAST(CASE WHEN count(*) > 0 AND floor(epoch(min(o_orderdate))) >= 631152000
        |                    AND floor(epoch(max(o_orderdate))) < 2082758400 THEN 1 ELSE 0 END AS BIGINT) FROM orders
        |  UNION ALL SELECT 'lineitem', count(*), floor(epoch(min(l_shipdate))), floor(epoch(max(l_shipdate))),
        |         CAST(CASE WHEN count(*) > 0 AND floor(epoch(min(l_shipdate))) >= 631152000
        |                    AND floor(epoch(max(l_shipdate))) < 2082758400 THEN 1 ELSE 0 END AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'events', count(*), floor(epoch(min(ts))), floor(epoch(max(ts))),
        |         CAST(CASE WHEN count(*) > 0 AND floor(epoch(min(ts))) >= 631152000
        |                    AND floor(epoch(max(ts))) < 2082758400 THEN 1 ELSE 0 END AS BIGINT) FROM events
        |  UNION ALL SELECT 'documents', count(*), CAST(min(doc_id) AS DOUBLE), CAST(max(doc_id) AS DOUBLE),
        |         CAST(CASE WHEN count(*) > 0 AND min(doc_id) >= 0 AND min(n_chars) >= 0
        |                    AND min(CASE WHEN length(text) = octet_length(encode(text)) THEN 1 ELSE 0 END) = 1
        |              THEN 1 ELSE 0 END AS BIGINT) FROM documents
        |  UNION ALL SELECT 'embeddings', count(*), CAST(min(vec_id) AS DOUBLE), CAST(max(vec_id) AS DOUBLE),
        |         CAST(CASE WHEN count(*) > 0 AND min(vec_id) >= 0
        |                    AND min(len(embedding)) = 64 AND max(len(embedding)) = 64 THEN 1 ELSE 0 END AS BIGINT) FROM embeddings)
        |SELECT tbl, n_rows, key_lo, key_hi, sane FROM f ORDER BY tbl""".stripMargin,
    "q187_low_variance" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS col_name, l_quantity AS x FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem),
        |m AS (SELECT col_name, count(*) AS n, count(DISTINCT x) AS n_distinct,
        |        CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean,
        |        CASE WHEN count(*) > 1 THEN
        |          sqrt((CAST(sum(CAST(x AS DECIMAL(28,2)) * CAST(x AS DECIMAL(28,2))) AS DOUBLE)
        |                - CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)
        |                  * (CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / count(*)))
        |               / (count(*) - 1)) END AS sd
        |      FROM u GROUP BY 1),
        |tv AS (SELECT col_name, max(c) AS top_n FROM (
        |         SELECT col_name, x, count(*) AS c FROM u GROUP BY 1, 2) GROUP BY 1)
        |SELECT m.col_name, m.n, m.n_distinct,
        |       round(m.mean, 6) AS mean,
        |       round(m.sd, 6) AS sd,
        |       CASE WHEN m.mean <> 0 THEN round(m.sd / abs(m.mean), 6) END AS cv,
        |       round(CAST(tv.top_n AS DOUBLE) / m.n, 6) AS top_value_share,
        |       CAST(CASE WHEN m.n_distinct = 1 OR CAST(tv.top_n AS DOUBLE) / m.n > 0.99
        |            THEN 1 ELSE 0 END AS BIGINT) AS near_constant
        |FROM m JOIN tv USING (col_name) ORDER BY col_name""".stripMargin,
    "q184_ks_source_drift" ->
      """WITH srcs AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |pairs AS (SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
        |          FROM srcs a JOIN srcs b ON a.source < b.source),
        |xs AS (SELECT p.sa, p.sb, p.na, p.nb, d.source AS src, d.n_chars AS x
        |       FROM pairs p JOIN documents d ON d.source IN (p.sa, p.sb)),
        |g AS (SELECT sa, sb, na, nb, x,
        |        sum(CASE WHEN src = sa THEN 1 ELSE 0 END) AS ca,
        |        sum(CASE WHEN src = sb THEN 1 ELSE 0 END) AS cb
        |      FROM xs GROUP BY 1, 2, 3, 4, 5),
        |c AS (SELECT sa, sb, na, nb, x,
        |        sum(ca) OVER (PARTITION BY sa, sb ORDER BY x ROWS UNBOUNDED PRECEDING) AS cca,
        |        sum(cb) OVER (PARTITION BY sa, sb ORDER BY x ROWS UNBOUNDED PRECEDING) AS ccb
        |      FROM g)
        |SELECT sa AS src_a, sb AS src_b,
        |       round(max(abs(CAST(cca AS DOUBLE)/na - CAST(ccb AS DOUBLE)/nb)), 6) AS ks_stat
        |FROM c GROUP BY 1, 2, na, nb ORDER BY 1, 2""".stripMargin,
    "q264_mann_whitney" ->
      s"""$mannWhitneyZCteSql
        |SELECT src_a, src_b, na, nb, u_stat, z_stat,
        |       CAST(CASE WHEN abs(z_stat) > 1.96 THEN 1 ELSE 0 END AS BIGINT) AS drift_flag
        |FROM z ORDER BY 1, 2""".stripMargin,
    "q359_bh_fdr" ->
      s"""$mannWhitneyZCteSql,
        |p AS (SELECT src_a, src_b, z_stat, abs(z_stat) AS az FROM z),
        |pv AS (SELECT src_a, src_b, z_stat, $NormTwoSidedPSql AS p_value FROM p),
        |rk AS (SELECT *, CAST(row_number() OVER (ORDER BY p_value, src_a, src_b)
        |         AS BIGINT) AS p_rank FROM pv),
        |m AS (SELECT count(*) AS m FROM rk),
        |fl AS (SELECT rk.*, m.m,
        |         CASE WHEN p_value * m <= p_rank * 0.05 THEN 1 ELSE 0 END AS passes
        |       FROM rk CROSS JOIN m),
        |ks AS (SELECT coalesce(max(CASE WHEN passes = 1 THEN p_rank END), 0) AS kstar
        |       FROM fl)
        |SELECT src_a, src_b, z_stat, p_value, p_rank, m AS n_tests,
        |       CAST(CASE WHEN p_rank <= kstar THEN 1 ELSE 0 END AS BIGINT) AS bh_reject,
        |       CAST(CASE WHEN p_value * m <= 0.05 THEN 1 ELSE 0 END AS BIGINT) AS bonf_reject
        |FROM fl CROSS JOIN ks ORDER BY p_rank""".stripMargin,
    "q185_fd_audit" ->
      """WITH fd1 AS (SELECT 'l_orderkey->o_custkey' AS fd,
        |               count(*) AS n_violating_keys FROM (
        |               SELECT l_orderkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |               GROUP BY l_orderkey HAVING count(DISTINCT o_custkey) > 1)),
        |fd2 AS (SELECT 'o_custkey->c_nationkey' AS fd,
        |          count(*) AS n_violating_keys FROM (
        |          SELECT o_custkey FROM orders JOIN customer ON o_custkey = c_custkey
        |          GROUP BY o_custkey HAVING count(DISTINCT c_nationkey) > 1)),
        |fd3 AS (SELECT 'p_name->p_brand (within part)' AS fd,
        |          count(*) AS n_violating_keys FROM (
        |          SELECT p_name FROM part GROUP BY p_name
        |          HAVING count(DISTINCT p_brand) > 1))
        |SELECT * FROM fd1 UNION ALL SELECT * FROM fd2 UNION ALL SELECT * FROM fd3
        |ORDER BY fd""".stripMargin,
    "q179_ref_integrity" ->
      """WITH lo AS (SELECT count(*) AS n FROM lineitem l
        |            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
        |ol AS (SELECT count(*) AS n FROM orders o
        |       WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)),
        |t AS (SELECT (SELECT count(*) FROM lineitem) AS nl, (SELECT count(*) FROM orders) AS no)
        |SELECT CAST(lo.n AS BIGINT) AS orphan_lineitems,
        |       CAST(ol.n AS BIGINT) AS childless_orders,
        |       nl AS n_lineitems, no AS n_orders,
        |       round(CAST(lo.n AS DOUBLE) / nl, 6) AS orphan_rate,
        |       round(CAST(ol.n AS DOUBLE) / no, 6) AS childless_rate
        |FROM lo, ol, t""".stripMargin,
    "q171_snapshot_diff" ->
      """WITH s AS (SELECT o_custkey, o_orderstatus,
        |             row_number() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn,
        |             count(*) OVER (PARTITION BY o_custkey) AS n
        |           FROM orders),
        |a0 AS (SELECT o_custkey, o_orderstatus,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn,
        |         count(*) OVER (PARTITION BY o_custkey) AS n
        |       FROM orders WHERE CAST(floor(epoch(o_orderdate)/86400) AS BIGINT) < 10100),
        |a AS (SELECT o_custkey, o_orderstatus AS st, n FROM a0 WHERE rn = 1),
        |b AS (SELECT o_custkey, o_orderstatus AS st, n FROM s WHERE rn = 1)
        |SELECT
        |  CAST((SELECT count(*) FROM b WHERE o_custkey NOT IN (SELECT o_custkey FROM a)) AS BIGINT) AS added,
        |  CAST((SELECT count(*) FROM a WHERE o_custkey NOT IN (SELECT o_custkey FROM b)) AS BIGINT) AS removed,
        |  CAST((SELECT count(*) FROM a JOIN b USING (o_custkey)
        |        WHERE a.st != b.st OR a.n != b.n) AS BIGINT) AS changed,
        |  CAST((SELECT count(*) FROM a JOIN b USING (o_custkey)
        |        WHERE a.st = b.st AND a.n = b.n) AS BIGINT) AS unchanged""".stripMargin,
    "q163_dp_counts" ->
      """WITH g AS (SELECT event_type, count(*) AS true_n FROM events GROUP BY 1),
        |u AS (SELECT event_type, true_n,
        |        (CAST(('0x' || substr(md5('graft-dp-v1|' || event_type), 1, 8)) AS BIGINT) + 0.5)
        |          / 4294967296.0 AS u
        |      FROM g),
        |nz AS (SELECT event_type, true_n,
        |         round(-1.0 * (CASE WHEN u < 0.5 THEN -1.0 ELSE 1.0 END)
        |               * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noise
        |       FROM u)
        |SELECT event_type, true_n, noise,
        |       CAST(round(true_n + noise, 0) AS BIGINT) AS dp_count
        |FROM nz ORDER BY event_type""".stripMargin,
    "q164_release_gate" ->
      """WITH m AS (SELECT count(*) AS n,
        |             count(DISTINCT o_orderkey) AS uniq_key,
        |             count(o_custkey) AS nn_cust,
        |             count(CASE WHEN o_totalprice > 0 AND o_totalprice < 1000000 THEN 1 END) AS in_range,
        |             count(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 END) AS in_domain
        |           FROM orders),
        |r AS (SELECT 'orderkey_unique' AS rule, CAST(uniq_key AS DOUBLE) / n AS observed,
        |             CAST(1.0 AS DOUBLE) AS threshold FROM m
        |      UNION ALL SELECT 'custkey_complete', CAST(nn_cust AS DOUBLE) / n, CAST(1.0 AS DOUBLE) FROM m
        |      UNION ALL SELECT 'totalprice_range', CAST(in_range AS DOUBLE) / n, CAST(0.99 AS DOUBLE) FROM m
        |      UNION ALL SELECT 'orderstatus_domain', CAST(in_domain AS DOUBLE) / n, CAST(1.0 AS DOUBLE) FROM m),
        |rules AS (SELECT count(*) AS n_rules,
        |            CAST(sum(CASE WHEN observed >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_passed
        |          FROM r),
        |b AS (SELECT count(*) AS bronze_rows FROM lineitem),
        |sv AS (SELECT count(*) AS silver_rows FROM (
        |         SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem
        |         WHERE l_returnflag IS NOT NULL))
        |SELECT n_rules, n_passed, bronze_rows, silver_rows,
        |       round(1.0 - CAST(silver_rows AS DOUBLE) / bronze_rows, 6) AS drop_ratio,
        |       CAST(CASE WHEN n_passed = n_rules
        |                  AND CAST(silver_rows AS DOUBLE) >= bronze_rows * 0.95
        |            THEN 1 ELSE 0 END AS BIGINT) AS gate
        |FROM rules, b, sv""".stripMargin,
    "q159_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS n_rows,
        |       count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS l_diversity,
        |       CAST(CASE WHEN count(*) < 10 THEN 1 ELSE 0 END AS BIGINT) AS k_violation,
        |       CAST(CASE WHEN count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) < 5
        |            THEN 1 ELSE 0 END AS BIGINT) AS l_violation
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q161_benford_audit" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
        |                  AS BIGINT) AS digit
        |           FROM orders WHERE o_totalprice > 0),
        |tot AS (SELECT count(*) AS n FROM d)
        |SELECT digit, count(*) AS n_orders,
        |       round(CAST(count(*) AS DOUBLE) / n, 6) AS share,
        |       round(log10(1.0 + 1.0 / digit), 6) AS benford_share,
        |       round(CAST(count(*) AS DOUBLE) / n - log10(1.0 + 1.0 / digit), 6) AS deviation
        |FROM d CROSS JOIN tot GROUP BY digit, n ORDER BY digit""".stripMargin,
    "q154_data_expectations" ->
      """WITH m AS (SELECT count(*) AS n,
        |             count(DISTINCT o_orderkey) AS uniq_key,
        |             count(o_custkey) AS nn_cust,
        |             count(CASE WHEN o_totalprice > 0 AND o_totalprice < 1000000 THEN 1 END) AS in_range,
        |             count(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 END) AS in_domain
        |           FROM orders),
        |r AS (
        |  SELECT 'orderkey_unique' AS rule, CAST(uniq_key AS DOUBLE) / n AS observed,
        |         CAST(1.0 AS DOUBLE) AS threshold FROM m
        |  UNION ALL SELECT 'custkey_complete', CAST(nn_cust AS DOUBLE) / n, CAST(1.0 AS DOUBLE) FROM m
        |  UNION ALL SELECT 'totalprice_range', CAST(in_range AS DOUBLE) / n, CAST(0.99 AS DOUBLE) FROM m
        |  UNION ALL SELECT 'orderstatus_domain', CAST(in_domain AS DOUBLE) / n, CAST(1.0 AS DOUBLE) FROM m)
        |SELECT rule, round(observed, 6) AS observed, threshold,
        |       CAST(CASE WHEN observed >= threshold THEN 1 ELSE 0 END AS BIGINT) AS passed
        |FROM r ORDER BY rule""".stripMargin,
    "q155_run_report" ->
      """WITH b AS (SELECT count(*) AS c FROM lineitem),
        |f AS (SELECT count(*) AS c FROM lineitem WHERE l_returnflag IS NOT NULL),
        |d AS (SELECT count(*) AS c FROM (
        |        SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem
        |        WHERE l_returnflag IS NOT NULL)),
        |g AS (SELECT count(*) AS c FROM (
        |        WITH dd AS (
        |          SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber
        |                    ORDER BY l_partkey, l_suppkey, l_quantity, l_extendedprice) AS rn
        |          FROM lineitem WHERE l_returnflag IS NOT NULL)
        |        SELECT DISTINCT l_returnflag,
        |               CASE WHEN l_extendedprice > 30000 THEN 'High' ELSE 'Low' END AS status
        |        FROM dd WHERE rn = 1))
        |SELECT CAST(1 AS BIGINT) AS stage_ord, 'null_filter' AS stage,
        |       b.c AS rows_in, f.c AS rows_out, b.c - f.c AS rows_dropped FROM b, f
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'key_dedup', f.c, d.c, f.c - d.c FROM f, d
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'gold_rollup', d.c, g.c, d.c - g.c FROM d, g
        |ORDER BY stage_ord""".stripMargin
  )
}
