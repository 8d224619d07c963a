package graft

import java.nio.file.Files
import graft.operators.{Medallion, Multimodal, Skew}
import graft.sources.Tables
import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Custom streaming state, skew-salted aggregation equivalence, bucketed
  * co-located joins, and the multimodal resize/frame-sample plumbing. */
class StatefulSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  test("flatMapGroupsWithState sessionization emits closed sessions as the watermark passes") {
    val dir = Files.createTempDirectory("graft-state").toFile.getAbsolutePath
    // batch 1: user 1 has two bursts 30m apart; batch 2 arrives 3h later,
    // pushing the watermark far past every batch-1 session deadline
    val w1 = new java.io.PrintWriter(s"$dir/a.json")
    for ((t, v) <- Seq(("00:00:00", 1.0), ("00:01:00", 2.0), ("00:31:00", 4.0)))
      w1.println(s"""{"event_id":0,"ts":"2024-01-01T$t.000Z","user_id":1,"event_type":"view","value":$v,"props":"{}"}""")
    w1.close()
    val w2 = new java.io.PrintWriter(s"$dir/b.json")
    w2.println(s"""{"event_id":9,"ts":"2024-01-01T03:00:00.000Z","user_id":2,"event_type":"view","value":9.0,"props":"{}"}""")
    w2.close()

    val events = EventStream.readEvents(spark, dir)
      .select($"user_id", $"ts", $"value").as[EventStream.UserEvent]
    val q = EventStream.sessionizeWithState(events, gapSec = 600)
      .writeStream.format("memory").queryName("closed_sessions")
      .outputMode(OutputMode.Append())
      .option("maxFilesPerTrigger", 1) // force two micro-batches so the watermark advances
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.sql("SELECT user_id, sess_start, n_events, sum_value FROM closed_sessions ORDER BY sess_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val h0 = 1704067200L
    // both batch-1 sessions of user 1 closed (intra-batch gap + watermark timeout);
    // user 2's session stays open (nothing after it) and must NOT be emitted
    got shouldBe Seq((1L, h0, 2L, 3.0), (1L, h0 + 31 * 60L, 1L, 4.0))
  }

  test("streaming as-of attribution carries last-touch state across micro-batches") {
    val dir = Files.createTempDirectory("graft-asof").toFile.getAbsolutePath
    def line(id: Long, t: String, u: Long, typ: String) =
      s"""{"event_id":$id,"ts":"2024-01-01T$t.000Z","user_id":$u,"event_type":"$typ","value":1.0,"props":"{}"}"""
    val w1 = new java.io.PrintWriter(s"$dir/a.json")
    w1.println(line(1, "00:00:00", 1, "view"))     // user 1's touch
    w1.println(line(2, "00:10:00", 1, "purchase")) // in-batch attribution
    w1.println(line(3, "00:05:00", 3, "purchase")) // no touch ever -> None
    w1.close()
    val w2 = new java.io.PrintWriter(s"$dir/b.json")
    w2.println(line(4, "01:00:00", 1, "purchase")) // cross-BATCH: batch-1 view must attribute
    w2.println(line(5, "01:00:00", 2, "click"))
    w2.println(line(6, "01:30:00", 2, "purchase"))
    w2.close()

    val events = EventStream.readEvents(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type").as[EventStream.TypedEvent]
    val q = EventStream.attributeAsOfStream(events)
      .writeStream.format("memory").queryName("asof_attr")
      .outputMode(OutputMode.Append())
      .option("maxFilesPerTrigger", 1) // force two micro-batches: state must carry
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.sql(
      "SELECT purchase_id, touch_event_id, touch_type, gap_s FROM asof_attr ORDER BY purchase_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) "" else r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    got shouldBe Seq(
      (2L, 1L, "view", 600L),   // same-batch last touch
      (3L, -1L, "", -1L),       // purchase before any touch: LEFT-asof None
      (4L, 1L, "view", 3600L),  // batch-2 purchase attributed to batch-1 state
      (6L, 5L, "click", 1800L)) // new user's touch then convert in one batch
  }

  test("salted aggregation equals the direct aggregation exactly") {
    val direct = Tables.read(spark, TestSpark.sf0001, "events")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedSumCount(
      Tables.read(spark, TestSpark.sf0001, "events"), Seq("event_type"), "value", 2, 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    salted shouldBe direct
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    val tuned = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~98% of the fact rows land on key 1 -> one reducer partition dwarfs
      // the median; AQE must split it instead of letting it straggle
      val fact = spark.range(200000).select(
        when($"id" % 100 < 98, lit(1L)).otherwise($"id" % 1000).as("k"),
        concat(lit("payload-"), $"id").as("payload"))
      val dim = spark.range(1000).select($"id".as("k"), lit("d").as("attr"))
      val joined = fact.join(dim, "k")
      // execute THIS frame's plan (count() would build a sibling query and
      // leave joined.queryExecution un-finalized)
      joined.collect().length shouldBe 200000
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("isFinalPlan=true")
      plan should include("skew=true")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft-wh").toFile.getAbsolutePath
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS graftbuck LOCATION '$wh'")
      Tables.read(spark, TestSpark.sf0001, "orders")
        .write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
        .saveAsTable("graftbuck.orders_b")
      Tables.read(spark, TestSpark.sf0001, "customer")
        .write.mode("overwrite").bucketBy(4, "c_custkey").sortBy("c_custkey")
        .saveAsTable("graftbuck.customer_b")
      val joined = spark.table("graftbuck.customer_b")
        .join(spark.table("graftbuck.orders_b"), $"c_custkey" === $"o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed layout: the join reads both sides bucket-by-bucket
      plan should not include "Exchange hashpartitioning"
      joined.count() should be > 0L
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graftbuck CASCADE")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("multimodal resize and frame sampling keep the batch contract") {
    val recs = Multimodal.withPayload(
      Tables.read(spark, TestSpark.sf0001, "documents").limit(10)).as[Multimodal.MediaRecord]
    val resized = Multimodal.resize(recs, 32, 32).collect()
    resized.length shouldBe 10
    all(resized.map(_.payload.length)) shouldBe (32 * 32 * 3 / 256)
    all(resized.map(_.width)) shouldBe 32

    val frames = Multimodal.sampleFrames(recs, frameBytes = 16, everyN = 4).collect()
    frames should not be empty
    // every sampled frame is at a stride-aligned index and ≤ frameBytes long
    frames.foreach { f =>
      (f.doc_id % (1L << 20)) % 4 shouldBe 0
      f.payload.length should be <= 16
    }
    // frame ids are collision-free across documents (the 2^20 namespace)
    frames.map(_.doc_id).distinct.length shouldBe frames.length
  }
}
