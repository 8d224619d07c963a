package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming lift of the event-time analytics: the same
  * declarative transforms as graft.operators.EventAnalytics, but over
  * `readStream` with watermarked state — the idiomatic upgrade path from the
  * reference's daily re-run batches (`airflow/dags/etl_api.py:85`,
  * `schedule_interval=timedelta(days=1)`) to continuous incremental
  * processing.
  *
  * Scale notes: state is keyed on (window, event_type) / (session, user_id) —
  * bounded by the watermark horizon, so executors hold O(active windows)
  * state, not O(history). Late events beyond the watermark are dropped
  * deterministically instead of corrupting totals.
  */
object EventStream {

  /** File-source stream of events-shaped JSON: schema declared, never
    * inferred (streaming requires it, and so does 100 TB batch — same rule). */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(Tables.events)
      .json(path)

  /** Tumbling 1-hour counts+sums per event type, tolerating 10 minutes of
    * event-time lateness. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").cast("long").as("unix_hour"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Per-user session aggregation (10-minute inactivity gap) with watermark —
    * the streaming form of q26_session_window. */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("sess_start"),
        col("n_events"))

  /** Sink the aggregation to an in-memory table (tests / demos) and process
    * all data currently available, then stop. */
  def runOnceToMemory(agg: DataFrame, tableName: String): Unit = {
    val q = agg.writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
