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
        .orderBy(col("event_type")))
  )

  val oracles: Map[String, String] = Map(
    "q49_salted_agg" ->
      """SELECT event_type, count(*) AS n_rows,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
