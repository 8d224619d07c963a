package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Skew-safe aggregation via salting. A low-cardinality hot key (here: five
  * event types over the whole corpus) funnels every row into a handful of
  * reducers; salting splits each key into `nSalts` sub-keys for the partial
  * phase and recombines in a second, tiny aggregation. Only decomposable
  * aggregates (sum/count/min/max) qualify — which is also why the decimal-
  * space sum matters: the two-phase total is bit-identical to the one-phase
  * one, so correctness is oracle-checkable. AQE's skew handling covers
  * joins; salting is the hand tool for skewed *aggregations* and for
  * engines/configs where AQE is off (e.g. inside Structured Streaming).
  */
object Skew extends QueryModule {

  /** Two-phase salted sum+count of `valueCol` (exact decimal at `scale`)
    * per `keyCols`. The salt is a deterministic hash of the value column —
    * any per-row expression works; determinism keeps re-runs identical. */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     scale: Int, nSalts: Int): DataFrame = {
    val keys = keyCols.map(col)
    df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(nSalts)))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(
        sum(col(valueCol).cast(DecimalType(18, scale))).as("__psum"),
        count(lit(1)).as("__pcnt"))
      .groupBy(keys: _*)
      .agg(
        sum(col("__pcnt")).as("n_rows"),
        sum(col("__psum")).cast(DoubleType).as("sum_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Salted rollup over the 5 hot event types; the oracle is the plain
    // one-phase GROUP BY — equality *is* the correctness proof that the
    // salt split + recombine loses nothing.
    "q49_salted_agg" -> ((s, dir) =>
      saltedSumCount(Tables.read(s, dir, "events"), Seq("event_type"), "value",
        scale = 2, nSalts = 16)
        .select(col("event_type"), col("n_rows"), col("sum_value"))
        .orderBy(col("event_type"))),

    // Join-key skew diagnostics (q162): the report you run BEFORE deciding
    // whether a join needs salting or AQE skew splitting — the frequency
    // distribution of the join key (max, mean, exact p50/p99, and the
    // max/mean skew ratio that predicts the straggler factor of a shuffle
    // keyed on it). Two aggregations: key → freq (map-side combined), then
    // freq → one summary row via Spark's exact `percentile` AGGREGATE (a
    // single-pass agg over the key rollup — no window, no global sort; at
    // extreme key cardinality swap in percentile_approx). The skew_ratio
    // here (~3.2) is the one q49's salting exists to absorb.
    "q162_skew_report" -> ((s, dir) =>
      Tables.read(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("freq"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("freq")).cast("long").as("n_rows"),
          max(col("freq")).cast("long").as("max_freq"),
          round(sum(col("freq")).cast(DoubleType) / count(lit(1)), 6).as("avg_freq"),
          round(expr("percentile(freq, 0.5)"), 6).as("p50_freq"),
          round(expr("percentile(freq, 0.99)"), 6).as("p99_freq"),
          round(max(col("freq")).cast(DoubleType)
            / (sum(col("freq")).cast(DoubleType) / count(lit(1))), 6).as("skew_ratio")))
  )

  val oracles: Map[String, String] = Map(
    "q49_salted_agg" ->
      """SELECT event_type, count(*) AS n_rows,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q162_skew_report" ->
      """WITH f AS (SELECT l_orderkey, count(*) AS freq FROM lineitem GROUP BY 1)
        |SELECT count(*) AS n_keys, CAST(sum(freq) AS BIGINT) AS n_rows,
        |       CAST(max(freq) AS BIGINT) AS max_freq,
        |       round(CAST(sum(freq) AS DOUBLE) / count(*), 6) AS avg_freq,
        |       round(quantile_cont(freq, 0.5), 6) AS p50_freq,
        |       round(quantile_cont(freq, 0.99), 6) AS p99_freq,
        |       round(CAST(max(freq) AS DOUBLE)
        |             / (CAST(sum(freq) AS DOUBLE) / count(*)), 6) AS skew_ratio
        |FROM f""".stripMargin
  )
}
