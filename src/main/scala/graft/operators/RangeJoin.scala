package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Keyless event-time range (proximity) join — an operator Spark has no
  * native physical strategy for: `|l.ts - r.ts| <= tol` with NO equi-key
  * plans as a BroadcastNestedLoopJoin (all-pairs) out of the box.
  *
  * The scale-safe formulation is temporal bucketing: bucket width = `tol`,
  * the left side explodes to its bucket and both neighbors {b-1, b, b+1},
  * the right side keeps its single bucket, and the join becomes a plain
  * shuffled EQUI-join on the bucket id followed by the exact tolerance
  * filter. Any pair within `tol` differs by at most one bucket, so coverage
  * is complete; a pair matches on exactly one of the three exploded buckets,
  * so no dedup pass is needed. This is the standard banded interval-join
  * layout (the same shape Databricks' range-join hint and Flink's interval
  * join use internally).
  *
  * Scale notes: the exploded side triples — explode the SMALLER input. The
  * bucket key is time, so skew is bounded by the busiest 2·tol window per
  * side; at 100 TB you widen `spark.sql.shuffle.partitions` or salt a
  * known-hot window, and every shuffle row carries only the projected
  * columns. Timestamps compare as floored epoch seconds (BIGINT) per the
  * engine determinism contract.
  */
object RangeJoin extends QueryModule {

  /** Proximity join: all (left, right) row pairs whose epoch-second columns
    * differ by at most `tolSec`. `leftSec`/`rightSec` name BIGINT epoch
    * columns; the two inputs must not share column names. */
  def timeProximityJoin(left: DataFrame, leftSec: String,
                        right: DataFrame, rightSec: String,
                        tolSec: Long): DataFrame = {
    require(tolSec > 0, "tolerance must be positive")
    val l = left.withColumn("__lb",
      explode(sequence(floor(col(leftSec) / tolSec).cast(LongType) - 1,
        floor(col(leftSec) / tolSec).cast(LongType) + 1)))
    val r = right.withColumn("__rb", floor(col(rightSec) / tolSec).cast(LongType))
    l.join(r, col("__lb") === col("__rb") &&
        abs(col(leftSec) - col(rightSec)) <= tolSec)
      .drop("__lb", "__rb")
  }

  private def typed(s: SparkSession, dir: String, t: String,
                    idAs: String, userAs: String, secAs: String): DataFrame =
    Tables.read(s, dir, "events")
      .filter(col("event_type") === t)
      .select(col("event_id").as(idAs), col("user_id").as(userAs),
        col("ts").cast(LongType).as(secAs))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Cross-user coincidence detection: purchases within 60 s of another
    // user's signup — a pure range join (no shared key), bucketed so the
    // plan stays a shuffled equi-join (asserted no-BNLJ in RelationalSpec).
    "q62_range_join" -> ((s, dir) => {
      val purchases = typed(s, dir, "purchase", "purchase_id", "p_user", "p_sec")
      val signups = typed(s, dir, "signup", "signup_id", "s_user", "s_sec")
      timeProximityJoin(purchases, "p_sec", signups, "s_sec", 60L)
        .filter(col("p_user") =!= col("s_user"))
        .select(col("purchase_id"), col("signup_id"),
          abs(col("p_sec") - col("s_sec")).as("gap_sec"))
        .orderBy(col("purchase_id"), col("signup_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q62_range_join" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id AS p_user,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS p_sec
        |           FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT event_id AS signup_id, user_id AS s_user,
        |             CAST(floor(epoch(ts)) AS BIGINT) AS s_sec
        |      FROM events WHERE event_type = 'signup')
        |SELECT purchase_id, signup_id, abs(p_sec - s_sec) AS gap_sec
        |FROM p JOIN s ON abs(p_sec - s_sec) <= 60 AND p_user != s_user
        |ORDER BY purchase_id, signup_id""".stripMargin
  )
}
