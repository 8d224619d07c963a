package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType, TimestampType}

/** Streaming near-duplicate ingest filtering — the production shape for
  * "don't re-ingest what the corpus already holds": a BATCH job builds a
  * compact SimHash bucket index over the reference corpus (rebuilt/compacted
  * on whatever cadence the corpus versioning runs), and the ingest STREAM
  * probes it. This splits the work the way a 100 TB deployment must:
  *
  *  - the reference side is static per microbatch — a stream-static
  *    equi-join, completely STATELESS on the stream side (no unbounded
  *    "all signatures ever seen" state growing in executors);
  *  - the index rows are narrow (chunk_id, chunk_val, ref_id, ref_sig) —
  *    the pigeonhole layout of [[graft.operators.Dedup.simhashHammingPairsFrom]],
  *    so every arrival within hamming distance k of ANY reference doc is
  *    retrieved by construction (guaranteed recall, exact verification);
  *  - flagging dedups multi-chunk matches with `dropDuplicatesWithinWatermark`,
  *    so per-arrival output is single-row and the dedup state is bounded by
  *    the event-time watermark, not the stream's lifetime.
  *
  * Arrivals that should be QUARANTINED come out of [[flagNearDups]]; the
  * complementary keep-stream is the stream-static left-anti of arrivals
  * against the same flagged ids at batch granularity (or downstream of the
  * quarantine topic) — emitting flags keeps this operator append-only. */
object DocStream {

  /** Arriving documents as a file-source stream: (doc_id, ts, text),
    * schema declared (streaming requires it). */
  val arrivalSchema: StructType = new StructType()
    .add("doc_id", LongType).add("ts", TimestampType).add("text", StringType)

  def readArrivals(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.readStream.schema(arrivalSchema).json(path)

  /** The batch-built probe index: one row per (chunk_id, chunk_val) of each
    * reference doc's 64-bit SimHash — 4 narrow rows per document. Persist /
    * publish via VersionedLayer on the corpus-compaction cadence. */
  def referenceIndex(referenceDocs: DataFrame): DataFrame =
    referenceDocs
      .select(col("doc_id").as("ref_id"), graft.operators.Dedup.simhash64Fast.as("ref_sig"))
      .select(col("ref_id"), col("ref_sig"),
        posexplode(expr("transform(sequence(0, 3), c -> shiftright(ref_sig, c * 16) & 65535)")))
      .withColumnRenamed("pos", "chunk_id").withColumnRenamed("col", "chunk_val")

  /** Flag every arriving document within hamming distance `k` (<= 3) of any
    * reference document: signature + chunk explode on the arrival (per-row
    * map work), stream-static equi-join on (chunk_id, chunk_val), exact
    * `bit_count` verification, then watermark-bounded per-arrival dedup of
    * multi-chunk matches. Append-mode output: (doc_id, ts). */
  def flagNearDups(arrivals: DataFrame, index: DataFrame, k: Int = 3): DataFrame = {
    require(k <= 3, "64-bit signature chunked 4x16: pigeonhole guarantee needs k <= 3")
    arrivals
      .withColumn("sig", graft.operators.Dedup.simhash64Fast)
      .select(col("doc_id"), col("ts"), col("sig"),
        posexplode(expr("transform(sequence(0, 3), c -> shiftright(sig, c * 16) & 65535)")))
      .withColumnRenamed("pos", "chunk_id").withColumnRenamed("col", "chunk_val")
      .join(index, Seq("chunk_id", "chunk_val"))
      .filter(expr("bit_count(sig ^ ref_sig)") <= k)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("doc_id")
      .select(col("doc_id"), col("ts"))
  }
}
