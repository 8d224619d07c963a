package graft.functions

/** The replayable-HLL building blocks shared by the batch sketches (q371/
  * q375) and the STREAMING register aggregation (q379): one SQL text per
  * step, valid verbatim on Spark and DuckDB, so every engine computes the
  * identical registers and estimates. The hash is the md5-derived 32-bit
  * value split 64-way; `rhoCase` is the leading-zero rank of the 26-bit
  * suffix `w` (27 − bitlength, 27 at w = 0) as a generated comparison
  * chain — no engine-specific bit intrinsics. */
object HllReplay {

  /** Register value from the suffix column `w`. */
  val rhoCase: String = "case " + (25 to 0 by -1).map(b =>
    s"when w >= ${1L << b} then ${26 - b}").mkString(" ") + " else 27 end"

  /** HLL estimate from `s` = Σ2^(−M_j) (double, empty registers counted as
    * 1) and `v` = empty-register count: α₆₄·m²/s with the small-range
    * linear-counting branch. */
  val estimateCase: String =
    "case when (0.709 * 4096.0 / s) <= 160.0 and v > 0" +
      " then 64.0 * ln(64.0 / v) else 0.709 * 4096.0 / s end"
}
