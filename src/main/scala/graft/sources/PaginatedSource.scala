package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Engine-side model of the reference's paginated REST extract
  * (`airflow/dags/etl_api.py:104-140`): loop `page = 1..` pulling JSON
  * records until an empty page, then land the batch as a DataFrame with a
  * declared schema. The page-fetch function is injected (this environment
  * has zero egress; in production it wraps the HTTP client) — the pagination
  * loop, schema application, and distribution semantics are the real
  * contract.
  */
object PaginatedSource {

  /** Driver-side accumulation, faithful to the reference's single-process
    * loop (`airflow/dags/etl_api.py:113-136` buffers all pages into one
    * local file before upload). Correct for control-plane-sized pulls (the
    * reference's corpus is ~9k records); NOT the path for large extracts —
    * see [[fetchDistributed]]. */
  def fetchAll(spark: SparkSession, schema: StructType, fetchPage: Int => Seq[String]): DataFrame = {
    import spark.implicits._
    val rows = Iterator.from(1).map(fetchPage).takeWhile(_.nonEmpty).flatten.toSeq
    spark.read.schema(schema).json(rows.toDS())
  }

  /** Distributed variant for large extracts: page numbers are parallelized
    * across executors and each task fetches its own pages — the driver never
    * holds the corpus. Requires the page count (or an upper bound; empty
    * pages contribute nothing) and a serializable fetch function. */
  def fetchDistributed(spark: SparkSession, schema: StructType, nPages: Int,
                       fetchPage: Int => Seq[String]): DataFrame = {
    import spark.implicits._
    val raw = spark.range(1, nPages + 1L).as[Long].flatMap(p => fetchPage(p.toInt))
    spark.read.schema(schema).json(raw)
  }
}
