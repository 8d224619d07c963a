package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A library module that contributes named queries to the engine surface.
  *
  * Each query is a pure function `(SparkSession, dataDir) => DataFrame` (the
  * driver contract, see SparkEntry). Where the semantics are expressible in
  * ANSI SQL, the module also publishes an equivalent DuckDB oracle statement
  * under the same name — which, since the round-16 q53 error-band oracle,
  * is EVERY query on the surface (two of them, q53/q196, as ASSERTED-FLAG
  * oracles: the sketch-verdict flag columns are asserted 1s, not replays —
  * see SparkEntry.oracleSql for the exact scope). Approximate operators are
  * ADDITIONALLY recall/error-gated in ScalaTest against their exact
  * counterparts (the oracle proves the pipeline; the spec proves the
  * approximation quality).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
