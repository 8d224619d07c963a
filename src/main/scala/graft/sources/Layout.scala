package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-clustering write layout (Z-ordering) — the
  * data-SKIPPING lever at 100 TB. A table sorted on one column prunes scans
  * only on that column's predicates; interleaving the bits of two cluster
  * columns' bucket ids (the Morton / Z-order curve) makes every written
  * file cover a small RECTANGLE of the (a, b) value space, so per-file
  * min/max statistics — parquet footers, Delta/Iceberg file stats — prune
  * selective predicates on EITHER column. This is what `OPTIMIZE ... ZORDER
  * BY` does in the lakehouse engines; here it is a plain DataFrame
  * transform: bucketize → interleave → `repartitionByRange` on the curve
  * key → sort within partitions → write.
  *
  * Scale design: bucket ids come from per-column [min, max] scalars (one
  * aggregate pass, attached as a one-row broadcast — never a collected
  * histogram), the curve key is a handful of codegen'd bitwise ops per row,
  * and the range partitioner is Spark's own (sampled boundaries, no
  * driver-side data). Value-uniform bucketing (not rank-uniform) is the
  * documented trade-off: heavy skew in a cluster column degrades toward
  * that column's sort — rank bucketing would need a quantile pass; plug one
  * in by swapping [[bucket16]].
  *
  * Observable contract (asserted in LayoutSpec rather than eyeballed):
  * after z-ordering lineitem 16-ways on (l_partkey, l_suppkey), a point
  * predicate on EITHER column overlaps the [min, max] of only a small
  * fraction of files, while a single-column sort leaves the other column
  * unprunable (every file overlaps).
  */
object Layout {

  /** Spread the low 16 bits of `x` to the even bit positions 0,2,...,30
    * (the classic Morton magic-number cascade — all codegen'd bitwise ops). */
  private def spreadBits(x: Column): Column = {
    val a = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Value-uniform 16-bit bucket of `v` within [mn, mx] (broadcast scalars);
    * a constant column degenerates to bucket 0. Double math, clamped — the
    * bucket id only steers layout, so float rounding at the boundary is
    * harmless (and no oracle depends on it). */
  private def bucket16(v: Column, mn: Column, mx: Column): Column =
    least(lit(65535L), greatest(lit(0L),
      floor((v.cast("double") - mn) / greatest(mx - mn, lit(1L)) * 65535.0).cast("long")))

  /** The 32-bit Morton key interleaving the 16-bit buckets of `a` (even
    * bits) and `b` (odd bits). */
  private def mortonKey(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Cluster `df` on the Z-order curve over two numeric columns: each
    * output partition (→ written file) covers a contiguous curve segment,
    * i.e. a small rectangle of the (colA, colB) space. */
  def zorderBy(df: DataFrame, colA: String, colB: String, nPartitions: Int): DataFrame = {
    val ranges = df.agg(
      min(col(colA).cast("long")).as("_mna"), max(col(colA).cast("long")).as("_mxa"),
      min(col(colB).cast("long")).as("_mnb"), max(col(colB).cast("long")).as("_mxb"))
    df.crossJoin(broadcast(ranges))
      .withColumn("__z", mortonKey(
        bucket16(col(colA), col("_mna"), col("_mxa")),
        bucket16(col(colB), col("_mnb"), col("_mxb"))))
      .repartitionByRange(nPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "_mna", "_mxa", "_mnb", "_mxb")
  }

  /** Z-order + write parquet at `path` (one file per curve segment). */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    nPartitions: Int = 16): Unit =
    zorderBy(df, colA, colB, nPartitions).write.mode("overwrite").parquet(path)
}
