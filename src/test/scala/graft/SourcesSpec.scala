package graft

import java.nio.file.Files
import graft.operators.Medallion
import graft.sources.{PaginatedSource, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Source-side semantics: the paginated extract model, the hash-agg dedup
  * equivalence, and partition pruning on a date-partitioned layout. */
/** Fake page server — top-level so executor-side closures don't drag the
  * (non-serializable) test class along. */
object FakePages extends Serializable {
  def page(p: Int): Seq[String] =
    if (p > 3) Seq.empty
    else (0 until 10).map(i =>
      s"""{"id":"${p * 100 + i}","name":"b$p-$i","brewery_type":"micro","city":"C$p","state":"S","value":${p * 10.0},"ingest_date":"2024-01-0$p"}""")
}

class SourcesSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}
  import FakePages.page

  test("paginated fetch stops at the first empty page and applies the schema") {
    val df = PaginatedSource.fetchAll(spark, Medallion.brewerySchema, page)
    df.count() shouldBe 30
    df.schema shouldBe Medallion.brewerySchema
    df.select("city").distinct().count() shouldBe 3
  }

  test("distributed fetch matches the driver-side fetch") {
    val a = PaginatedSource.fetchAll(spark, Medallion.brewerySchema, page)
    val b = PaginatedSource.fetchDistributed(spark, Medallion.brewerySchema, 10, page)
    b.count() shouldBe 30 // pages 4..10 are empty and contribute nothing
    a.select("id").collect().map(_.getString(0)).sorted shouldBe
      b.select("id").collect().map(_.getString(0)).sorted
  }

  test("JSON staging dump round-trips through the bronze reader (K4)") {
    val out = Files.createTempDirectory("graft-stage").toFile.getAbsolutePath
    val fetched = PaginatedSource.fetchAll(spark, Medallion.brewerySchema, page)
    Medallion.stageJson(fetched, out)
    val back = Medallion.bronzeFromJson(spark, out)
    back.schema shouldBe Medallion.brewerySchema
    back.count() shouldBe fetched.count()
    back.select("id", "name", "value").collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2))).sorted shouldBe
      fetched.select("id", "name", "value").collect().map(r =>
        (r.getString(0), r.getString(1), r.getDouble(2))).sorted
  }

  test("CSV and ORC round-trip with explicit schemas (no inference, values intact)") {
    val fetched = PaginatedSource.fetchAll(spark, Medallion.brewerySchema, page)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "name", "value").collect().map(r =>
        (r.getString(0), r.getString(1), r.getDouble(2))).sorted
    // CSV: header on write, explicit StructType on read — schema-on-read
    // inference is banned for the same reason as S2 (a sampled schema
    // drifts batch to batch; a declared one cannot)
    val csvDir = Files.createTempDirectory("graft-csv").toFile.getAbsolutePath + "/d"
    fetched.write.option("header", "true").csv(csvDir)
    val csvBack = spark.read.option("header", "true").schema(Medallion.brewerySchema).csv(csvDir)
    csvBack.schema shouldBe Medallion.brewerySchema
    key(csvBack) shouldBe key(fetched)
    // ORC: the other columnar format a complete engine must read and write
    val orcDir = Files.createTempDirectory("graft-orc").toFile.getAbsolutePath + "/d"
    fetched.write.orc(orcDir)
    val orcBack = spark.read.schema(Medallion.brewerySchema).orc(orcDir)
    key(orcBack) shouldBe key(fetched)
  }

  test("hash-agg dedup is equivalent to window dedup under a total-order tiebreak") {
    val li = Tables.read(spark, sf0001, "lineitem")
    val win = Medallion.dedupByKey("l_orderkey",
      col("l_linenumber"), col("l_partkey"), col("l_suppkey"), col("l_quantity"), col("l_extendedprice"))(li)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    val agg = Medallion.dedupByKeyAgg(Seq("l_orderkey"),
      Seq("l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"))(li)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    win.collect().toSet shouldBe agg.collect().toSet
  }

  test("date-partitioned layout prunes partitions on read") {
    val out = Files.createTempDirectory("graft-part").toFile.getAbsolutePath
    Tables.read(spark, sf0001, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("order_year").parquet(out)
    val all = spark.read.parquet(out)
    val pruned = all.filter(col("order_year") === 1996)
    // the filter must reach the scan as a partition filter (directory-level
    // pruning), not a row-level predicate
    val plan = pruned.queryExecution.executedPlan.toString
    plan should include("PartitionFilters: [isnotnull(order_year")
    plan should include("= 1996")
    val expected = Tables.read(spark, sf0001, "orders")
      .filter(year(col("o_orderdate")) === 1996).count()
    pruned.count() shouldBe expected
  }

  // --- events reader: physical-type drift coverage (the round-11 class) ---
  // The live fixtures are timestamp[us]; the legacy ns-as-long branch and
  // the sanity probe would otherwise have ZERO coverage the moment the
  // driver regenerates fixtures again.

  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    Seq((1L, 1704067200000000L, 10L, "click", 1.0, "{}"),
        (2L, 1704067260000000L, 11L, "view", 2.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), tsCol.as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("events reader branches on the actual parquet type: timestamp[us] fixture") {
    val dir = Files.createTempDirectory("graft-ev-us").toFile.getAbsolutePath
    writeEvents(dir, timestamp_micros(col("us")))
    val out = Tables.read(spark, dir, "events")
    out.schema("ts").dataType shouldBe org.apache.spark.sql.types.TimestampType
    val years = out.select(year(col("ts"))).collect().map(_.getInt(0))
    years.distinct shouldBe Array(2024)
  }

  test("events reader branches on the actual parquet type: legacy INT64-nanos fixture") {
    val dir = Files.createTempDirectory("graft-ev-ns").toFile.getAbsolutePath
    writeEvents(dir, (col("us") * 1000L).as("ns")) // raw nanos as plain INT64
    val out = Tables.read(spark, dir, "events")
    out.schema("ts").dataType shouldBe org.apache.spark.sql.types.TimestampType
    // ns -> us floor must land on the identical instants
    out.select(unix_timestamp(col("ts"))).collect().map(_.getLong(0)).sorted shouldBe
      Array(1704067200L, 1704067260L)
  }

  test("events reader fails LOUDLY on a timestamp-unit drift (1970-era values)") {
    val dir = Files.createTempDirectory("graft-ev-bad").toFile.getAbsolutePath
    // what the round-11 bug produced: us values accidentally divided by 1000
    writeEvents(dir, timestamp_micros(expr("us div 1000")))
    val e = intercept[IllegalArgumentException] {
      Tables.read(spark, dir, "events").collect()
    }
    e.getMessage should include("sanity probe failed")
  }

  test("fixture fingerprint reports every table sane on the live fixtures") {
    val fp = graft.sources.FixtureCheck.fingerprintFrame(spark, sf0001).collect()
    fp.length shouldBe 10
    all(fp.map(_.getAs[Long]("sane"))) shouldBe 1L
    noException should be thrownBy graft.sources.FixtureCheck.assertSane(spark, sf0001)
  }

  test("fixture fingerprint flags a drifted table as not sane (named in the error)") {
    // corrupt shape: documents with out-of-envelope (negative) doc_ids in an
    // otherwise-valid fixture dir — the reader-side probes can't see this,
    // only the fingerprint envelope can, and assertSane must NAME the table
    val dir = Files.createTempDirectory("graft-fp-bad").toFile.getAbsolutePath
    for (t <- Seq("region", "nation", "supplier", "customer", "part",
                  "orders", "lineitem", "events", "embeddings")) {
      Tables.read(spark, sf0001, t).write.parquet(s"$dir/$t.parquet")
    }
    Tables.read(spark, sf0001, "documents")
      .withColumn("doc_id", -col("doc_id") - 1)
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      graft.sources.FixtureCheck.assertSane(spark, dir)
    }
    e.getMessage should include("documents")
  }
}
