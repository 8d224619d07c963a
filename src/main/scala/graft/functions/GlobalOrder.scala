package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed EXACT global ordering — `row_number`/`ntile` over a total
  * order without the `Exchange SinglePartition` a plain unpartitioned
  * window plans (a single-node sort of the whole input, the one shape that
  * cannot survive a 100 TB scale-up).
  *
  * The classic two-pass construction:
  *   1. `repartitionByRange` on the sort key — a range exchange, so
  *      partition `i` holds keys strictly below partition `i+1`'s;
  *   2. count rows per physical partition (a metadata-sized rollup,
  *      ≤ numPartitions rows, collected to the driver — the same bounded
  *      collect `RDD.zipWithIndex` performs);
  *   3. broadcast the cumulative offsets back and add them to a
  *      per-partition `row_number` (a window PARTITIONED on the partition
  *      id — parallel across partitions, never single-node).
  *
  * Global rank of a row = rows in all lower ranges + rank within its own
  * range. Exact, deterministic, and every stage is partition-parallel; the
  * price is one extra pass over the (checkpointed) ranged frame for the
  * counts. The frame is pinned with `localCheckpoint` so the counts pass
  * and the rank pass see the IDENTICAL partition membership — on a real
  * cluster the same pinning comes from `persist(DISK_ONLY)`.
  *
  * `sortCols` must be a TOTAL order (tie-broken to row uniqueness, the
  * repo-wide determinism rule): range boundaries may split runs of equal
  * composite keys arbitrarily, and only a total order makes the result
  * well-defined at all.
  */
object GlobalOrder {

  private val PID = "__go_pid"
  private val OFF = "__go_off"

  /** `df` + `rnCol` = the exact global `row_number()` under `sortCols`,
    * computed with the two-pass ranged construction above (no
    * single-partition exchange anywhere in the plan). */
  def withRowNumber(df: DataFrame, rnCol: String, sortCols: Column*): DataFrame =
    ranked(df, sortCols) match {
      case (parted, _) => parted.withColumnRenamed(RN, rnCol)
    }

  /** Same as [[withRowNumber]] but also returns the total row count, which
    * the offsets pass computes anyway — callers that need N (percentile
    * positions, tile sizing) get it without a second full scan. */
  def withRowNumberAndCount(df: DataFrame, rnCol: String,
      sortCols: Column*): (DataFrame, Long) =
    ranked(df, sortCols) match {
      case (parted, total) => (parted.withColumnRenamed(RN, rnCol), total)
    }

  /** `df` + `tileCol` = the exact global `ntile(tiles)` under `sortCols`.
    * SQL ntile semantics reproduced in closed form from the global row
    * number: with N rows and k tiles, the first N mod k tiles take
    * ceil(N/k) rows and the rest floor(N/k) — identical bucket membership
    * to `ntile(k) OVER (ORDER BY ...)` on Spark and DuckDB alike, so
    * oracle hash parity is preserved by construction. */
  def withNtile(df: DataFrame, tiles: Int, tileCol: String, sortCols: Column*): DataFrame = {
    val (parted, total) = ranked(df, sortCols)
    val q = total / tiles // floor(N/k) rows in the tail tiles
    val r = total % tiles // the first r tiles take q+1 rows
    val rn = col(RN)
    val tile =
      if (total == 0L) lit(null).cast(LongType)
      else if (q == 0L) rn // N < k: one row per tile, tile = rank
      else when(rn <= lit(r * (q + 1)), ceil(rn / lit((q + 1).toDouble)))
        .otherwise(lit(r) + ceil((rn - lit(r * (q + 1))) / lit(q.toDouble)))
    parted.withColumn(tileCol, tile.cast(LongType)).drop(RN)
  }

  private val RN = "__go_rn"

  /** The shared construction: returns (frame + global `RN` column, total
    * row count). The count rides along from the offsets pass for free. */
  private def ranked(df: DataFrame, sortCols: Seq[Column]): (DataFrame, Long) = {
    require(sortCols.nonEmpty, "GlobalOrder needs at least one sort column")
    val s = df.sparkSession
    val parted = df
      .repartitionByRange(s.conf.get("spark.sql.shuffle.partitions").toInt, sortCols: _*)
      .withColumn(PID, spark_partition_id())
      .localCheckpoint() // pin membership: counts pass == rank pass
    // Bounded driver collect: one (pid, count) row per partition.
    val counts = parted.groupBy(col(PID)).agg(count(lit(1)).as("c"))
      .collect().map(row => (row.getInt(0), row.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).init) // exclusive prefix sum
    import s.implicits._
    val offDf = offsets.toSeq.toDF(PID, OFF)
    val w = Window.partitionBy(col(PID)).orderBy(sortCols: _*)
    val out = parted.join(broadcast(offDf), PID)
      .withColumn(RN, row_number().over(w).cast(LongType) + col(OFF))
      .drop(PID, OFF)
    (out, total)
  }
}
