package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Closed-form least-squares fit of `y` on `x`, optionally per group — the
  * shared engine behind the corpus-law fits (Zipf q115, Heaps q126) and the
  * per-segment trend scan (q151). Inputs are a 2-column `(x, y)` frame
  * (both pre-rounded or pass-through doubles) plus any group columns.
  *
  * Determinism: the five moment sums accumulate in DECIMAL(38,12) (order-
  * independent, so partition order can never flip a rounding boundary), and
  * the final slope/intercept arithmetic is the identical IEEE double
  * operand sequence on either engine. Degenerate groups (a single point,
  * or all x equal) zero the denominator and yield NULL on both engines —
  * the repo-wide denominator-guard convention.
  *
  * Scale: one hash aggregation with map-side partial sums; group count is
  * the output cardinality, never the input's. */
object Ols {
  private val dec = DecimalType(38, 12)

  /** (slope, intercept, `countAs`=n) per group; global fit when
    * `groupCols` is empty. */
  def fit(xy: DataFrame, groupCols: Seq[String], countAs: String): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) xy.groupBy()
      else xy.groupBy(groupCols.map(col): _*)
    val s = grouped.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(dec)).cast("double").as("sx"),
      sum(col("y").cast(dec)).cast("double").as("sy"),
      sum(round(col("x") * col("y"), 12).cast(dec)).cast("double").as("sxy"),
      sum(round(col("x") * col("x"), 12).cast(dec)).cast("double").as("sxx"))
    def den: Column = col("n") * col("sxx") - col("sx") * col("sx")
    val outCols = groupCols.map(col) ++ Seq(
      col("n").as(countAs),
      when(den =!= 0,
        round((col("n") * col("sxy") - col("sx") * col("sy")) / den, 6))
        .as("slope"),
      when(den =!= 0,
        round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
          den * col("sx")) / col("n"), 6))
        .as("intercept"))
    s.select(outCols: _*)
  }
}
