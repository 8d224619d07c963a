package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level dense-vector math over `ArrayType` embedding columns.
  *
  * Everything here composes built-in higher-order functions (`zip_with`,
  * `aggregate`, `transform`) — all Catalyst expressions that stay inside
  * whole-stage codegen, with no UDF serialization boundary. The fold is a
  * sequential left-fold, so the floating-point result is deterministic for a
  * given element order (required for oracle comparison, and for reproducible
  * ANN results at scale).
  */
object VectorFunctions {

  /** Cast a float-array column to double elements (do all math in double). */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product of two equal-length numeric array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Sum of squares (squared L2 norm). */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity: dot / (||a|| * ||b||). Inputs should already be
    * double arrays (see [[asDouble]]). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Squared L2 distance (sequential fold of (x-y)²). */
  def distSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Cosine via the codegen'd native expression when the session has
    * [[GraftExtensions]] installed, else the interpreted HOF fallback.
    * Both compute the identical operation sequence — results are
    * bit-identical; only throughput differs. */
  def cosineFast(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column =
    if (spark.catalog.functionExists("graft_cosine")) call_function("graft_cosine", a, b)
    else cosine(a, b)

  /** [[distSq]] via the native `graft_l2sq` expression when available —
    * same fast/fallback contract as [[cosineFast]]. */
  def distSqFast(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column =
    if (spark.catalog.functionExists("graft_l2sq")) call_function("graft_l2sq", a, b)
    else distSq(a, b)
}
