package graft

import java.nio.file.Files
import graft.operators.Medallion
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Reference-parity semantics of the medallion pipeline
  * (glue/etl_api.py:24-49): null filter, deterministic dedup, CaseWhen
  * boundary, gold counts, and the partitioned silver write layout. */
class MedallionSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def rawJson(rows: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-raw").toFile
    val f = new java.io.File(dir, "part-0.json")
    val w = new java.io.PrintWriter(f)
    rows.foreach(w.println)
    w.close()
    dir.getAbsolutePath
  }

  private val raw = Seq(
    // id=1 duplicated: older row has value 50, newer (2024-01-02) has 150 —
    // the deterministic survivor is the newest ingest_date
    """{"id":"1","name":"alpha","brewery_type":"micro","city":"Austin","state":"TX","value":50.0,"ingest_date":"2024-01-01"}""",
    """{"id":"1","name":"alpha","brewery_type":"micro","city":"Austin","state":"TX","value":150.0,"ingest_date":"2024-01-02"}""",
    """{"id":"2","name":"beta","brewery_type":"nano","city":"Austin","state":"TX","value":100.0,"ingest_date":"2024-01-01"}""",
    """{"id":"3","name":"gamma","brewery_type":"micro","city":"Dallas","state":"TX","value":101.0,"ingest_date":"2024-01-01"}""",
    """{"id":null,"name":"dropped","brewery_type":"macro","city":"Waco","state":"TX","value":10.0,"ingest_date":"2024-01-01"}""")

  test("full pipeline: null filter, dedup survivor, status boundary, gold counts, partition layout") {
    val out = Files.createTempDirectory("graft-out").toFile.getAbsolutePath
    val gold = Medallion.runPipeline(spark, rawJson(raw), out)

    val silver = spark.read.parquet(s"$out/silver")
    // null id dropped (F1), dup id=1 collapsed (D1) -> 3 rows
    silver.count() shouldBe 3
    // survivor of id=1 is the newest ingest_date -> value 150 -> High
    val s1 = silver.filter($"id" === "1").collect()
    s1.length shouldBe 1
    s1.head.getAs[Double]("value") shouldBe 150.0
    s1.head.getAs[String]("status") shouldBe "High"
    // CaseWhen boundary (P1): value == 100 is NOT > 100 -> Low
    silver.filter($"id" === "2").head().getAs[String]("status") shouldBe "Low"
    silver.filter($"id" === "3").head().getAs[String]("status") shouldBe "High"

    // K2: hive-style partition directories by state/city
    new java.io.File(s"$out/silver/state=TX/city=Austin").exists() shouldBe true
    new java.io.File(s"$out/silver/state=TX/city=Dallas").exists() shouldBe true

    // A1 gold: one row per (brewery_type, city) with counts
    val g = gold.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    g(("micro", "Austin")) shouldBe 1L
    g(("nano", "Austin")) shouldBe 1L
    g(("micro", "Dallas")) shouldBe 1L
    // gold total == silver rows (every silver row lands in exactly one group)
    g.values.sum shouldBe 3L
  }

  test("observed silver stage reports exact audit metrics in the same pass") {
    val bronze = Medallion.bronzeFromJson(spark, rawJson(raw))
    val (silver, inObs, outObs) = Medallion.silverObserved(bronze)
    silver.count() shouldBe 3              // the action that materializes metrics
    inObs.get("rows_in") shouldBe 5L       // every raw row entered
    inObs.get("null_keys") shouldBe 1L     // the null-id reject
    outObs.get("rows_out") shouldBe 3L     // after reject + dedup collapse
    outObs.get("high_rows") shouldBe 2L    // 150 and 101 clear the 100 threshold
    // the audit identity the run log stores: in - nulls - dedup losses = out
    (inObs.get("rows_in").asInstanceOf[Long]
      - inObs.get("null_keys").asInstanceOf[Long] - 1L) shouldBe
      outObs.get("rows_out").asInstanceOf[Long]
  }

  test("dedup is idempotent and deterministic") {
    val df = Seq(
      ("a", 1, "x"), ("a", 2, "y"), ("b", 1, "z"), ("b", 1, "z2"), ("c", 9, "w")
    ).toDF("id", "v", "payload")
    val once = Medallion.dedupByKey("id", col("v"), col("payload"))(df)
    val twice = Medallion.dedupByKey("id", col("v"), col("payload"))(once)
    once.collect().toSet shouldBe twice.collect().toSet
    once.count() shouldBe 3
    // survivor for b is (1, "z") — ordered tiebreak, not arrival order
    once.filter($"id" === "b").head().getAs[String]("payload") shouldBe "z"
    // filter ⊆ input
    val filtered = Medallion.requireField("id")(df)
    filtered.count() should be <= df.count()
  }

  test("incremental daily run: only the window's partitions are written; re-runs are idempotent") {
    val out = Files.createTempDirectory("graft-incr").toFile.getAbsolutePath
    val silver = s"$out/silver"
    // day 1 run
    Medallion.runIncremental(spark, rawJson(raw), silver, "2024-01-01", "2024-01-02")
    val d1 = spark.read.parquet(silver)
    d1.count() shouldBe 3 // ids 1 (old version), 2, 3 on day 1
    // day 2 run: only id=1's newer record — day 1 partition untouched
    Medallion.runIncremental(spark, rawJson(raw), silver, "2024-01-02", "2024-01-03")
    val d2 = spark.read.parquet(silver)
    d2.count() shouldBe 4
    new java.io.File(s"$silver/ingest_date=2024-01-01").exists() shouldBe true
    new java.io.File(s"$silver/ingest_date=2024-01-02").exists() shouldBe true
    // re-run day 2: idempotent — partition replaced, not appended
    Medallion.runIncremental(spark, rawJson(raw), silver, "2024-01-02", "2024-01-03")
    spark.read.parquet(silver).count() shouldBe 4
    // re-run an empty window: nothing written, nothing destroyed
    Medallion.runIncremental(spark, rawJson(raw), silver, "2024-02-01", "2024-02-02")
    spark.read.parquet(silver).count() shouldBe 4
  }

  test("incremental window keeps [start, end) semantics") {
    val df = Seq("2024-01-01 00:00:00", "2024-01-02 00:00:00", "2024-01-03 00:00:00")
      .toDF("d").select(col("d").cast("timestamp").as("ts"))
    val win = Medallion.incrementalWindow("ts", "2024-01-02", "2024-01-03")(df)
    win.collect().map(_.getTimestamp(0).toString) shouldBe Array("2024-01-02 00:00:00.0")
  }
}
