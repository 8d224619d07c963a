package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Order-independent ("exact") floating-point aggregation.
  *
  * A plain `sum(double)` depends on the order partial aggregates combine in,
  * which differs run-to-run on a cluster and engine-to-engine (Spark vs the
  * DuckDB oracle). The fixture money columns are exact 2-decimal values, so
  * summing them in decimal space is exact and order-independent; casting the
  * exact decimal total back to double yields a bit-identical result in any
  * engine. This is also the right call at 100 TB: a billion-row revenue sum
  * keeps full precision instead of drifting by summation order.
  */
object ExactAgg {

  /** Exact sum of a (fixed-decimal-valued) double column via DecimalType.
    * `scale` must be >= the true decimal scale of the values (2 for prices,
    * 4 for price*(1-disc) products, 6 for triple products). */
  def exactSum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact average = exact sum / count, evaluated as one double division so
    * both engines perform the identical final operation. */
  def exactAvg(c: Column, scale: Int): Column =
    exactSum(c, scale) / count(lit(1))
}
