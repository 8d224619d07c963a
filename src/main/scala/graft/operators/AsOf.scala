package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** AS-OF join — the temporal operator Spark's relational surface lacks
  * natively (kdb's `aj`, DuckDB's `ASOF JOIN`). Each "probe" row is matched
  * to the most recent "build" row at or before its timestamp within the same
  * key.
  *
  * Implementation choice (brief §custom-operators, option (a): compose
  * existing ops): when both sides share a key + time axis, the as-of match
  * is a running `last_value(..., ignoreNulls)` over the UNION of the two
  * row sets, sorted once per key — a single window pass with NO join, no
  * per-probe binary search, and no range-join explosion. At 100 TB this is
  * one shuffle on the key and one sort, the same cost as any windowed
  * analytic; a join-based formulation would need an interval join that
  * Catalyst can only plan as a broadcast-nested-loop. A custom SparkPlan
  * would only pay off for merge-joining two pre-sorted bucketed tables —
  * documented trade-off, not needed at this surface.
  */
object AsOf extends QueryModule {

  /** Attach to every row of `df` the most recent value of `markerValue`
    * among earlier rows (inclusive of the current row, ordered by
    * `orderCols`) where `markerCond` held, per `keyCol` partition. */
  def asofLast(df: DataFrame, keyCol: Column, orderCols: Seq[Column],
               markerCond: Column, markerValue: Column, outName: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*).rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn(outName, last(when(markerCond, markerValue), ignoreNulls = true).over(w))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Attribution: each purchase matched as-of to the user's most recent
    // prior (or same-instant, ordered by event_id) view.
    "q57_asof_attribution" -> ((s, dir) => {
      val ev = Tables.read(s, dir, "events")
      asofLast(ev, col("user_id"), Seq(col("ts"), col("event_id")),
        col("event_type") === "view", col("ts"), "last_view")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          col("ts").cast(LongType).as("purchase_ts"),
          col("last_view").cast(LongType).as("attributed_view"))
        .orderBy(col("event_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q57_asof_attribution" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS last_view
        |  FROM events)
        |SELECT event_id, user_id,
        |       CAST(floor(epoch(ts)) AS BIGINT) AS purchase_ts,
        |       CAST(floor(epoch(last_view)) AS BIGINT) AS attributed_view
        |FROM s WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin
  )
}
