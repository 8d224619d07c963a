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
               markerCond: Column, markerValue: Column, outName: String): DataFrame =
    asofLastAll(df, keyCol, orderCols, markerCond, Seq(markerValue -> outName))

  /** Multi-column [[asofLast]]: attach SEVERAL fields of the most recent
    * marker row in one pass. All output columns must ride one select over
    * one shared window spec — nesting single-column calls leaves a Project
    * between the Window operators, which defeats CollapseWindow and plans
    * one shuffle+sort PER column (measured: 3 WindowExecs for 3 legs). The
    * legs share the marker predicate, so they null out together and always
    * describe the same matched row. */
  def asofLastAll(df: DataFrame, keyCol: Column, orderCols: Seq[Column],
                  markerCond: Column, values: Seq[(Column, String)]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*).rowsBetween(Window.unboundedPreceding, 0)
    df.select(col("*") +: values.map { case (v, n) =>
      last(when(markerCond, v), ignoreNulls = true).over(w).as(n) }: _*)
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
    }),

    // Whole-row as-of (q124): q57 carries one scalar back from the matched
    // row; the general point-in-time lookup (a feature-store read, kdb's
    // `aj` proper) needs the ENTIRE matched row. asofLastAll carries the
    // touch's timestamp, id and type through one shared window spec — a
    // single WindowExec, one shuffle + one sort (EventTextSpec pins that
    // plan shape) — and the legs null out together (same marker
    // predicate), so they always describe the same touch row. Markers here
    // are click OR view (last touch of any kind); purchases with no prior
    // touch keep NULL attribution (LEFT-asof), and touch_gap_s prices the
    // attribution window in floored-epoch seconds.
    "q124_asof_attribution" -> ((s, dir) => {
      val ev = Tables.read(s, dir, "events")
      val touch = col("event_type").isin("click", "view")
      val withTouch = asofLastAll(ev, col("user_id"),
        Seq(col("ts"), col("event_id")), touch,
        Seq(col("ts").cast(LongType) -> "lt_t",
          col("event_id") -> "lt_id",
          col("event_type") -> "lt_type"))
      withTouch.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          col("ts").cast(LongType).as("ts_s"),
          col("lt_id").as("touch_event_id"),
          col("lt_type").as("touch_type"),
          (col("ts").cast(LongType) - col("lt_t")).as("touch_gap_s"))
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
        |FROM s WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q124_asof_attribution" ->
      """WITH s AS (
        |  SELECT event_id, user_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |         last_value(CASE WHEN event_type IN ('click', 'view')
        |                         THEN CAST(floor(epoch(ts)) AS BIGINT) END IGNORE NULLS) OVER w AS lt_t,
        |         last_value(CASE WHEN event_type IN ('click', 'view')
        |                         THEN event_id END IGNORE NULLS) OVER w AS lt_id,
        |         last_value(CASE WHEN event_type IN ('click', 'view')
        |                         THEN event_type END IGNORE NULLS) OVER w AS lt_type
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING))
        |SELECT event_id, user_id, t AS ts_s, lt_id AS touch_event_id,
        |       lt_type AS touch_type, t - lt_t AS touch_gap_s
        |FROM s WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin
  )
}
