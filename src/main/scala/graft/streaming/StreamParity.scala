package graft.streaming

import graft.QueryModule
import graft.functions.ExactAgg.exactSum
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Streaming⇄batch parity as an ORACLED query (q197): the round-12 verdict's
  * missing piece — `streaming/EventStream.scala` was spec-only because the
  * DuckDB oracle cannot execute a stream. This module closes the gap by
  * actually RUNNING a Structured Streaming query inside the registered
  * query function: the fixture events table is read back as a file-source
  * STREAM, aggregated with the watermarked windowed pipeline, sunk with
  * `Trigger.AvailableNow` to a memory table, and the registered result is
  * that table — so the driver's DuckDB hash compare proves, end to end,
  * that the streaming path computes exactly the batch answer (the
  * replayability contract a lambda-architecture pipeline depends on:
  * backfill-by-batch and serve-by-stream must agree bit-for-bit).
  *
  * Scale notes: the streaming plan is the production shape — file source,
  * event-time watermark, windowed partial aggregation; state is O(open
  * windows × event types). Only the SINK is harness-shaped: a memory sink
  * holds the final (hour × type) grid on the driver — bounded (~hours ×
  * |types| rows, a few thousand at any SF), and a real deployment swaps it
  * for a parquet/Kafka sink without touching the plan.
  */
object StreamParity extends QueryModule {

  /** File-source STREAM of the fixture events table — the streaming twin of
    * [[Tables.read]]: same footer probe (ns-vs-µs physical drift, the
    * round-11 incident class), same declared schema (a stream can never
    * infer), same µs conversion on the legacy branch. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // batch footer probe (cheap — no data pages); the stream itself then
    // reads with the branch's declared schema
    Tables.read(spark, dir, "events") // runs probe + sanity check once
    // The file-stream source monitors a DIRECTORY (its production contract:
    // files land in a drop folder); fixtures ship events.parquet as a single
    // file, so stage it into a per-(dir) temp directory via symlink — zero
    // copy, and the stream sees the standard files-in-a-directory layout.
    val stage = stageDirs.computeIfAbsent(path, { _ =>
      val d = java.nio.file.Files.createTempDirectory("graft_q197_events")
      java.nio.file.Files.createSymbolicLink(
        d.resolve("events.parquet"), java.nio.file.Paths.get(path))
      d.toString
    })
    spark.read.parquet(path).schema("ts").dataType match {
      case TimestampType | TimestampNTZType =>
        spark.readStream.schema(Tables.events).parquet(stage)
      case LongType =>
        spark.readStream.schema(Tables.eventsOnDisk).parquet(stage)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other =>
        throw new IllegalStateException(
          s"events.ts at $path has unsupported parquet-mapped type $other")
    }
  }

  /** One staging directory per fixture file per JVM (bench reps reuse it). */
  private val stageDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Tumbling 1-hour counts + DECIMAL-space sums per event type — the
    * [[EventStream.hourlyByType]] pipeline with the engine's exact-sum
    * discipline so the streaming result is order-independent and
    * hash-comparable (a plain double sum would differ from the oracle in
    * the last ulp depending on partition fold order). */
  def hourlyByTypeExact(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"), exactSum(col("value"), 2).as("sum_value"))
      .select(col("event_type"),
        col("window.start").cast(LongType).as("unix_hour"),
        col("n_events"), col("sum_value"))

  /** Memory-sink names must be unique per invocation (bench reps re-run the
    * query in one session; a reused name would collide). */
  private val sinkSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Streaming batch-equivalence (q197): see the module scaladoc. The
    // oracle is the plain batch SQL — a green hash row IS the proof that
    // the streaming path computes the batch answer.
    "q197_stream_batch_equiv" -> ((s, dir) => {
      val agg = hourlyByTypeExact(readEventsStream(s, dir))
      val sink = s"q197_sink_${sinkSeq.incrementAndGet()}"
      EventStream.runOnceToMemory(agg, sink)
      s.table(sink).orderBy(col("event_type"), col("unix_hour"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q197_stream_batch_equiv" ->
      """SELECT event_type,
        |       CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS unix_hour,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
