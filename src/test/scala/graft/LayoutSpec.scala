package graft

import java.nio.file.Files

import graft.sources.{Layout, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Asserts the data-skipping property Z-ordering exists for: per-file
  * [min, max] envelopes must be selective on BOTH cluster columns, where a
  * single-column sort leaves the second column unprunable. File-level
  * min/max is exactly what parquet footers / lakehouse file stats expose to
  * a scan planner, so "fraction of files a point predicate overlaps" IS the
  * scan cost model. */
class LayoutSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  /** For each written file: (min, max) of `c`; returns the fraction of
    * files whose envelope contains `v`. */
  private def overlapFraction(dir: String, c: String, v: Long): Double = {
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min(col(c).cast("long")).as("mn"), max(col(c).cast("long")).as("mx"))
      .collect()
    stats.count(r => r.getLong(1) <= v && v <= r.getLong(2)).toDouble / stats.length
  }

  private lazy val li: DataFrame = Tables.read(spark, sf0001, "lineitem")

  test("z-order makes point predicates on BOTH cluster columns file-prunable") {
    val dir = Files.createTempDirectory("zorder").toString + "/li"
    Layout.writeZOrdered(li, dir, "l_partkey", "l_suppkey", nPartitions = 16)
    // median-ish probe values (planted mid-range, not endpoints)
    val pk = li.agg(expr("percentile(l_partkey, 0.5)")).head().getDouble(0).toLong
    val sk = li.agg(expr("percentile(l_suppkey, 0.5)")).head().getDouble(0).toLong
    // The Z-curve gives each of the 16 files a half-range envelope on each
    // cluster column, so ~0.5 overlap is the EXPECTED value for a median
    // probe — assert with margin (vs > 0.9 for the unclustered contrast
    // below); an exact-0.5 run is one file-boundary away and must pass.
    overlapFraction(dir, "l_partkey", pk) should be < 0.75
    overlapFraction(dir, "l_suppkey", sk) should be < 0.75
  }

  test("single-column sort leaves the second column unprunable (the contrast)") {
    val dir = Files.createTempDirectory("sorted").toString + "/li"
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(dir)
    val sk = li.agg(expr("percentile(l_suppkey, 0.5)")).head().getDouble(0).toLong
    // suppkey values scatter across every partkey range: no file can be skipped
    overlapFraction(dir, "l_suppkey", sk) should be > 0.9
  }

  test("z-ordering preserves the data exactly (same rows, any order)") {
    val dir = Files.createTempDirectory("zcontent").toString + "/li"
    Layout.writeZOrdered(li, dir, "l_partkey", "l_suppkey", nPartitions = 8)
    val back = spark.read.parquet(dir)
    back.count() shouldBe li.count()
    back.exceptAll(li.select(back.columns.map(col): _*)).count() shouldBe 0L
  }
}
