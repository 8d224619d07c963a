package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture fingerprint — the guard the round-11 incident showed was missing.
  *
  * The driver regenerates the fixture parquet between rounds, and a silent
  * physical-schema drift (events.ts TIMESTAMP(NANOS) → timestamp[us]) once
  * corrupted every event timestamp by 1000× while every conf-level check
  * still passed: 31 queries regressed with no named failure anywhere. This
  * module asserts the DATA envelope, not the conf: per table, row count,
  * key range, and — for the timestamp tables — that the value range lands
  * in the sane era (a unit misread lands in 1970 or 52970, never 1990-2035).
  *
  * Runs as both:
  *  - a loud assertion at the top of [[graft.Verify]] / [[graft.Bench]]
  *    ([[assertSane]]) so fixture drift fails the round with a named error
  *    instead of N mystery regressions;
  *  - an oracled query (q193 in [[graft.operators.Expectations]]) — DuckDB
  *    computes the same envelope from the same files, so a drift that fools
  *    the engine's reader but not DuckDB's (exactly the round-11 class)
  *    surfaces as a hash mismatch on the fingerprint row itself.
  *
  * Cost: one count+min/max scan per table (columnar, key columns only) —
  * at 100 TB these are footer-stat-answerable aggregations; at fixture
  * scale they add ~1 s once per run.
  */
object FixtureCheck {

  /** [1990-01-01, 2036-01-01) as epoch seconds — the era every fixture
    * date/timestamp must land in; a ns/µs unit misread misses it by 1000×
    * in one direction or the other. */
  private val EpochLo = 631152000.0
  private val EpochHi = 2082758400.0

  /** One row per fixture table: (tbl, n_rows, key_lo, key_hi, sane).
    * `key` is the table's representative key (id or event-time) cast to
    * double; `sane` = 1 iff the table is non-empty and the key envelope
    * lands in its expected range (plus table-specific invariants: embedding
    * dim == 64, n_chars >= 0). Deterministic, SF-independent — the oracle
    * recomputes the identical envelope at any scale. */
  def fingerprintFrame(s: SparkSession, dir: String): DataFrame = {
    def t(name: String) = Tables.read(s, dir, name)

    def idRow(name: String, key: String): DataFrame =
      t(name).agg(count(lit(1)).as("n_rows"),
          min(col(key)).cast("double").as("key_lo"),
          max(col(key)).cast("double").as("key_hi"))
        .select(lit(name).as("tbl"), col("n_rows"), col("key_lo"), col("key_hi"),
          when(col("n_rows") > 0 && col("key_lo") >= 0, 1L).otherwise(0L).as("sane"))

    def tsRow(name: String, key: String): DataFrame =
      t(name).agg(count(lit(1)).as("n_rows"),
          min(unix_timestamp(col(key))).cast("double").as("key_lo"),
          max(unix_timestamp(col(key))).cast("double").as("key_hi"))
        .select(lit(name).as("tbl"), col("n_rows"), col("key_lo"), col("key_hi"),
          when(col("n_rows") > 0
            && col("key_lo") >= EpochLo && col("key_hi") < EpochHi, 1L)
            .otherwise(0L).as("sane"))

    // The ASCII pin: several multimodal/byte-slicing oracles (q194/q195)
    // index text by CHAR offset while the engine slices UTF-8 BYTES — the
    // equivalence holds only while every fixture document is pure ASCII
    // (char length == byte length). Pinning it HERE means a non-ASCII
    // fixture regeneration fails with the table named, not as an
    // unexplained hash mismatch three queries downstream.
    val docs = t("documents")
      .agg(count(lit(1)).as("n_rows"),
        min(col("doc_id")).cast("double").as("key_lo"),
        max(col("doc_id")).cast("double").as("key_hi"),
        min(col("n_chars")).as("min_chars"),
        min(when(length(col("text")) === octet_length(col("text")), 1L)
          .otherwise(0L)).as("ascii_ok"))
      .select(lit("documents").as("tbl"), col("n_rows"), col("key_lo"), col("key_hi"),
        when(col("n_rows") > 0 && col("key_lo") >= 0 && col("min_chars") >= 0
          && col("ascii_ok") === 1, 1L)
          .otherwise(0L).as("sane"))

    val embs = t("embeddings")
      .agg(count(lit(1)).as("n_rows"),
        min(col("vec_id")).cast("double").as("key_lo"),
        max(col("vec_id")).cast("double").as("key_hi"),
        min(size(col("embedding"))).as("min_dim"),
        max(size(col("embedding"))).as("max_dim"))
      .select(lit("embeddings").as("tbl"), col("n_rows"), col("key_lo"), col("key_hi"),
        when(col("n_rows") > 0 && col("key_lo") >= 0
          && col("min_dim") === 64 && col("max_dim") === 64, 1L)
          .otherwise(0L).as("sane"))

    Seq(
      idRow("region", "r_regionkey"), idRow("nation", "n_nationkey"),
      idRow("supplier", "s_suppkey"), idRow("customer", "c_custkey"),
      idRow("part", "p_partkey"),
      tsRow("orders", "o_orderdate"), tsRow("lineitem", "l_shipdate"),
      tsRow("events", "ts"),
      docs, embs
    ).reduce(_.union(_)).orderBy(col("tbl"))
  }

  /** Collects the (bounded: 10-row) fingerprint and throws with every
    * offending table named if any envelope is off — run FIRST in
    * Verify/Bench so fixture drift is one named failure, not 31 silent
    * regressions. */
  def assertSane(s: SparkSession, dir: String): Unit = {
    val bad = fingerprintFrame(s, dir).collect()
      .filter(_.getAs[Long]("sane") == 0L)
      .map(r => s"${r.getAs[String]("tbl")}: n_rows=${r.getAs[Long]("n_rows")} " +
        s"key=[${r.getAs[Double]("key_lo")}, ${r.getAs[Double]("key_hi")}]")
    require(bad.isEmpty,
      "fixture fingerprint FAILED (schema/unit drift in the regenerated " +
        s"fixtures at $dir?):\n  " + bad.mkString("\n  "))
  }
}
