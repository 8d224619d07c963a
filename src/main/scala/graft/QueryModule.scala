package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A library module that contributes named queries to the engine surface.
  *
  * Each query is a pure function `(SparkSession, dataDir) => DataFrame` (the
  * driver contract, see SparkEntry). Where the semantics are expressible in
  * ANSI SQL, the module also publishes an equivalent DuckDB oracle statement
  * under the same name; approximate / hash-dependent operators (MinHash-LSH,
  * ANN) are deliberately oracle-free and are instead covered by ScalaTest
  * specs that check them against their exact counterparts.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
