package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** AQE skew-join mitigation — the remaining 100×-scale hazard class after
  * skewed AGGREGATION (q49/q162 salt that away): a shuffle join whose key
  * distribution concentrates in one partition serializes the whole join
  * behind a single straggler task. Spark's AQE splits the oversized
  * partition into advisory-sized slices at runtime (duplicating the matching
  * build rows), which is exactly the mitigation a 1000-executor run needs —
  * but only if the session config actually lets the rule fire. Like
  * RuntimeFilterSpec, this is a CAUSAL check on this engine's plans: the
  * skew=true marker must appear under the mitigation flag and disappear
  * under its kill switch, so the assertion can't pass on coincidental plan
  * text. (Thresholds are relaxed to local fixture sizes; the RULE exercised
  * is the same one a cluster-scale plan hits at the default 256 MB.) */
class SkewJoinSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark

  /** A planted 99%-one-key skew: the left side concentrates on key 0, the
    * right side is uniform — the classic hot-row-id ⋈ dimension shape. */
  private def skewedJoin(broadcastRight: Boolean = false): DataFrame = {
    val left = spark.range(200000L)
      .select(when(col("id") % 100 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val right = spark.range(2000L).select(col("id").as("k"), col("id").as("w"))
    left.join(if (broadcastRight) broadcast(right) else right, "k")
  }

  /** Runs the join to completion (AQE re-plans at runtime, so the final
    * plan only exists after execution) and returns the adaptive plan text. */
  private def executedPlanWith(skewEnabled: Boolean): String = {
    val c = spark.conf
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.enabled", skewEnabled.toString)
    // local shuffle sizes sit far below the production 256 MB threshold;
    // relax so the local plan exercises the same OptimizeSkewedJoin rule
    c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    // a broadcast join needs no skew handling — force the shuffle path, and
    // keep AQE from first coalescing the skew away below detection size
    c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    c.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val j = skewedJoin()
      // collect(), not count(): count() spawns a SEPARATE aggregate query
      // and leaves j's own adaptive plan unexecuted (isFinalPlan=false) —
      // collect() drives j's QueryExecution itself, so the final re-planned
      // tree is the one inspected (same pattern as Spark's own AQE suite)
      j.collect()
      j.queryExecution.executedPlan.toString
    } finally {
      Seq("spark.sql.adaptive.enabled", "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.coalescePartitions.enabled").foreach(c.unset)
    }
  }

  test("a planted skewed shuffle join is split by AQE (skew=true in the final plan)") {
    executedPlanWith(skewEnabled = true) should include("skew=true")
  }

  test("the mitigation is causal: the kill switch removes the skew split") {
    executedPlanWith(skewEnabled = false) should not include "skew=true"
  }

  test("the skew split does not change the join result") {
    val c = spark.conf
    c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    try {
      // ground truth from the broadcast path (no skew machinery involved):
      // the skew-split shuffle join must produce the identical row count
      val expected = skewedJoin(broadcastRight = true).count()
      skewedJoin().count() shouldBe expected
    } finally {
      Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes").foreach(c.unset)
    }
  }
}
