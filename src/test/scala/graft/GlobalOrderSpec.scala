package graft

import graft.functions.GlobalOrder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** [[graft.functions.GlobalOrder]] — the distributed exact ranking that
  * replaced the q112/q143 single-node sorts. Equivalence is checked against
  * the unpartitioned-window reference on real fixture data (which contains
  * planted duplicate sort-prefix keys), plus the plan property the whole
  * construction exists for: no `Exchange SinglePartition` feeding a Sort. */
class GlobalOrderSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  private def orders = graft.sources.Tables.read(spark, sf0001, "orders")
    .select(col("o_orderkey"), col("o_totalprice"))

  test("withRowNumber matches the unpartitioned row_number window exactly") {
    val ref = orders.withColumn("rn",
      row_number().over(Window.orderBy(col("o_totalprice"), col("o_orderkey"))).cast("long"))
    val got = GlobalOrder.withRowNumber(orders, "rn",
      col("o_totalprice"), col("o_orderkey"))
    got.select("o_orderkey", "rn").except(ref.select("o_orderkey", "rn"))
      .count() shouldBe 0L
    got.count() shouldBe ref.count()
  }

  test("withNtile matches the unpartitioned ntile window for k in {3, 8}") {
    for (k <- Seq(3, 8)) {
      val ref = orders.withColumn("tile",
        ntile(k).over(Window.orderBy(col("o_totalprice"), col("o_orderkey"))).cast("long"))
      val got = GlobalOrder.withNtile(orders, k, "tile",
        col("o_totalprice"), col("o_orderkey"))
      withClue(s"k=$k: ") {
        got.select("o_orderkey", "tile").except(ref.select("o_orderkey", "tile"))
          .count() shouldBe 0L
        got.count() shouldBe ref.count()
      }
    }
  }

  test("withNtile matches under a descending sort key") {
    val ref = orders.withColumn("tile",
      ntile(4).over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))).cast("long"))
    val got = GlobalOrder.withNtile(orders, 4, "tile",
      col("o_totalprice").desc, col("o_orderkey"))
    got.select("o_orderkey", "tile").except(ref.select("o_orderkey", "tile"))
      .count() shouldBe 0L
  }

  test("withNtile with more tiles than rows degenerates to tile = rank") {
    val tiny = orders.orderBy(col("o_orderkey")).limit(5)
    val got = GlobalOrder.withNtile(tiny, 100, "tile",
      col("o_totalprice"), col("o_orderkey"))
      .orderBy(col("tile")).collect()
    got.map(_.getAs[Long]("tile")).toSeq shouldBe Seq(1L, 2L, 3L, 4L, 5L)
  }

  test("the ranked plan has no single-partition sort") {
    val plan = GlobalOrder.withNtile(orders, 8, "tile",
      col("o_totalprice"), col("o_orderkey"))
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toVector
    val hits = lines.indices.count { i =>
      lines(i).contains("Exchange SinglePartition") &&
        (i - 2 to i - 1).exists(j => j >= 0 && lines(j).contains("Sort "))
    }
    hits shouldBe 0
  }

  test("empty input yields an empty result, not a crash") {
    val empty = orders.filter(col("o_orderkey") < 0)
    GlobalOrder.withNtile(empty, 4, "tile",
      col("o_totalprice"), col("o_orderkey")).count() shouldBe 0L
    GlobalOrder.withRowNumber(empty, "rn",
      col("o_totalprice"), col("o_orderkey")).count() shouldBe 0L
  }
}
