package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multimodal-column plumbing: images/audio/video ride through the engine as
  * opaque `BinaryType` payloads plus a typed metadata struct, and per-batch
  * "decode / feature-extract" runs as partition-local typed map work
  * (`Dataset.mapPartitions` — the Scala analog of `mapInPandas`: one iterator
  * per partition, batch-shaped, no driver involvement, no shuffle).
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): [[MultimodalStub.decodeImageStub]] is a clearly-marked
  * deterministic fake that derives "pixel" features from the payload bytes.
  * Everything around it — schema, binary column handling, partitioning,
  * batch iterator shape — is real and is what carries over to a cluster with
  * real codecs on the executors' classpath.
  */
object Multimodal extends QueryModule {

  /** A multimodal record: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte],
                         width: Int, height: Int, channels: Int)

  /** Extracted features (what a real decoder would emit per item). */
  case class MediaFeatures(doc_id: Long, byte_len: Long, width: Int, height: Int,
                           mean_byte: Double, first_byte: Int)

  object MultimodalStub {
    /** STUB — deterministic fake decoder. A real deployment replaces this
      * body with an actual codec (e.g. javax.imageio / ffmpeg bindings); the
      * signature and the surrounding mapPartitions plumbing are the real
      * contract. Features derive only from the payload bytes, so the fake is
      * reproducible. */
    def decodeImageStub(r: MediaRecord): MediaFeatures = {
      val n = r.payload.length
      val mean = if (n == 0) 0.0 else r.payload.map(b => (b & 0xff).toLong).sum.toDouble / n
      MediaFeatures(r.doc_id, n.toLong, r.width, r.height, mean, if (n == 0) -1 else r.payload(0) & 0xff)
    }
  }

  /** Attach a binary payload + metadata struct to the documents table (the
    * fixtures carry no real media, so the payload is the UTF-8 text bytes —
    * the *plumbing* under test, not the codec). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      (((col("doc_id") % 64) + 1) * 16).cast("int").as("width"),
      (((col("doc_id") % 48) + 1) * 16).cast("int").as("height"),
      lit(3).as("channels"))

  /** Partition-local batch decode: iterator-in/iterator-out per partition. */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map(MultimodalStub.decodeImageStub))
  }

  /** "Resize" every record to target dimensions — STUB: a real codec scales
    * pixels; the fake deterministically re-samples the payload bytes to the
    * target byte budget (truncate or cycle-pad), so downstream code sees the
    * correct metadata + payload-size contract. Partition-local, no shuffle. */
  def resize(records: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map { r =>
      val target = math.max(1, w * h * r.channels / 256) // fake byte budget
      val p = if (r.payload.isEmpty) Array.fill[Byte](target)(0)
      else Array.tabulate[Byte](target)(i => r.payload(i % r.payload.length))
      MediaRecord(r.doc_id, p, w, h, r.channels)
    })
  }

  /** Sample every Nth "frame" of a video-shaped payload — STUB: a real
    * implementation seeks keyframes; the fake slices the payload into
    * fixed-size chunks and keeps chunk indices ≡ 0 (mod n), emitting one
    * record per kept frame (iterator-out > 1: the flatMap batch shape).
    * Frame ids namespace as doc_id·2²⁰ + idx — 2²⁰ frames per document of
    * headroom (256 MB of payload at 256-byte frames) so ids cannot collide
    * across documents; the old ·1000 namespace collided (and made
    * orderBy(frame_id) tie-nondeterministic) past idx 999, i.e. payloads
    * >= 256,000 bytes. */
  def sampleFrames(records: Dataset[MediaRecord], frameBytes: Int, everyN: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (frame, idx) if idx % everyN == 0 =>
          MediaRecord((r.doc_id << 20) + idx, frame, r.width, r.height, r.channels)
      }
    })
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata/payload pipeline, oracle-checkable subset of the features
    // (byte length + first byte are decoder-independent).
    "q41_multimodal_meta" -> ((s, dir) => {
      import s.implicits._
      val recs = withPayload(Tables.read(s, dir, "documents")).as[MediaRecord]
      extractFeatures(recs).toDF()
        .select(col("doc_id"), col("byte_len"), col("width"), col("height"), col("first_byte"))
        .orderBy(col("doc_id"))
    }),

    // Frame sampling (q194): the video-shaped flatMap batch contract —
    // fixed-size 256-byte "frames", keep every 4th, one output record per
    // kept frame. The slicing arithmetic is decoder-independent, and the
    // fixture text is pure ASCII (byte offset == char offset, asserted by
    // the oracle itself matching), so DuckDB replays the exact frame grid:
    // frame count, per-frame byte length (last frame ragged), and the
    // frame's first byte.
    "q194_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val recs = withPayload(Tables.read(s, dir, "documents")).as[MediaRecord]
      extractFeatures(sampleFrames(recs, frameBytes = 256, everyN = 4)).toDF()
        .select(col("doc_id").as("frame_id"), col("byte_len"), col("first_byte"))
        .orderBy(col("frame_id"))
    }),

    // Binary-payload exact dedup by orientation class (q337): the media
    // analog of q34's text dedup, run THROUGH the BinaryType column — md5
    // the payload bytes, count distinct payloads per metadata orientation
    // (landscape/portrait/square from the width×height struct), and price
    // the duplicated storage. This is the first pass every media corpus
    // runs (identical bytes re-crawled under different ids dominate image
    // sets); only 16-byte fingerprints and the metadata class reach the
    // shuffle, never the payloads.
    "q337_payload_dedup" -> ((s, dir) => {
      val recs = withPayload(Tables.read(s, dir, "documents"))
      recs.select(
          when(col("width") > col("height"), lit("landscape"))
            .when(col("width") < col("height"), lit("portrait"))
            .otherwise(lit("square")).as("orientation"),
          md5(col("payload")).as("fp"),
          length(col("payload")).cast(LongType).as("b"))
        .groupBy(col("orientation"))
        .agg(count(lit(1)).as("n_items"),
          countDistinct(col("fp")).as("n_distinct"),
          sum(col("b")).as("total_bytes"))
        .select(col("orientation"), col("n_items"), col("n_distinct"),
          (col("n_items") - col("n_distinct")).as("n_dup_items"),
          col("total_bytes"),
          round((col("n_items") - col("n_distinct")).cast("double")
            / col("n_items"), 6).as("dup_rate"))
        .orderBy(col("orientation"))
    }),

    // Frame-sampling accounting (q338): per document, what the 256-byte /
    // keep-every-4th sampling policy (q194's pipeline) actually RETAINS —
    // frame count, bytes kept, and the keep ratio against the original
    // payload. The engine aggregates the REAL mapPartitions flatMap
    // output; the oracle derives the same numbers from the closed-form
    // chunk arithmetic — so the Dataset pipeline's batch contract itself
    // is hash-gated, not just eyeballed (the plumbing the brief says must
    // be real even while the codec is stubbed).
    "q338_frame_accounting" -> ((s, dir) => {
      import s.implicits._
      val recs = withPayload(Tables.read(s, dir, "documents")).as[MediaRecord]
      val frames = sampleFrames(recs, frameBytes = 256, everyN = 4).toDF()
        .select(expr("doc_id div 1048576").as("doc_id"),
          length(col("payload")).cast(LongType).as("b"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"), sum(col("b")).as("bytes_kept"))
      val orig = withPayload(Tables.read(s, dir, "documents"))
        .select(col("doc_id"), length(col("payload")).cast(LongType).as("orig_bytes"))
        .filter(col("orig_bytes") > 0)
      frames.join(orig, "doc_id")
        .select(col("doc_id"), col("n_frames"), col("bytes_kept"), col("orig_bytes"),
          round(col("bytes_kept").cast("double") / col("orig_bytes"), 6)
            .as("keep_ratio"))
        .orderBy(col("doc_id"))
    }),

    // Resize audit (q195): the deterministic byte-budget resample — target
    // 64x64x3/256 = 48 bytes, truncate-or-cycle-pad — then the stub decode
    // over the resized payload. byte_len pins the budget contract,
    // first_byte survives the resample, mean_byte is the exact integer mean
    // of the cycled bytes (sum is an exact integer in both engines, so the
    // 6-dp round replays bit-for-bit).
    "q195_resize_audit" -> ((s, dir) => {
      import s.implicits._
      val recs = withPayload(Tables.read(s, dir, "documents")).as[MediaRecord]
      extractFeatures(resize(recs, 64, 64)).toDF()
        .select(col("doc_id"), col("byte_len"), col("first_byte"),
          round(col("mean_byte"), 6).as("mean_byte"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q337_payload_dedup" ->
      """WITH r AS (SELECT doc_id, md5(text) AS fp,
        |             CAST(octet_length(encode(text)) AS BIGINT) AS b,
        |             ((doc_id % 64) + 1) * 16 AS w, ((doc_id % 48) + 1) * 16 AS h
        |           FROM documents),
        |c AS (SELECT CASE WHEN w > h THEN 'landscape'
        |                  WHEN w < h THEN 'portrait'
        |                  ELSE 'square' END AS orientation, fp, b FROM r)
        |SELECT orientation, count(*) AS n_items,
        |       count(DISTINCT fp) AS n_distinct,
        |       CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_dup_items,
        |       CAST(sum(b) AS BIGINT) AS total_bytes,
        |       round(CAST(count(*) - count(DISTINCT fp) AS DOUBLE) / count(*), 6) AS dup_rate
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q338_frame_accounting" ->
      """WITH d AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n
        |           FROM documents WHERE octet_length(encode(text)) > 0),
        |c AS (SELECT doc_id, n, (n + 255) // 256 AS chunks FROM d),
        |k AS (SELECT doc_id, n, chunks,
        |        (chunks + 3) // 4 AS n_frames,
        |        CASE WHEN (chunks - 1) % 4 = 0
        |             THEN (((chunks + 3) // 4) - 1) * 256 + (n - 256 * (chunks - 1))
        |             ELSE ((chunks + 3) // 4) * 256 END AS bytes_kept
        |      FROM c)
        |SELECT doc_id, n_frames, bytes_kept, n AS orig_bytes,
        |       round(CAST(bytes_kept AS DOUBLE) / n, 6) AS keep_ratio
        |FROM k ORDER BY doc_id""".stripMargin,
    "q41_multimodal_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |       CAST(((doc_id % 64) + 1) * 16 AS INTEGER) AS width,
        |       CAST(((doc_id % 48) + 1) * 16 AS INTEGER) AS height,
        |       ascii(substring(text, 1, 1)) AS first_byte
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q194_frame_sample" ->
      """WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        |f AS (SELECT doc_id, text, n,
        |        unnest(range(CAST(ceil(n / 256.0) AS BIGINT))) AS idx FROM d),
        |k AS (SELECT doc_id * 1048576 + idx AS frame_id,
        |        CAST(least(256, n - idx * 256) AS BIGINT) AS byte_len,
        |        ascii(substring(text, CAST(idx * 256 + 1 AS INTEGER), 1)) AS first_byte
        |      FROM f WHERE idx % 4 = 0)
        |SELECT frame_id, byte_len, first_byte FROM k ORDER BY frame_id""".stripMargin,
    "q195_resize_audit" ->
      """WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        |b AS (SELECT doc_id, n, text, unnest(range(48)) AS i FROM d),
        |v AS (SELECT doc_id, i,
        |        CASE WHEN n = 0 THEN 0
        |             ELSE ascii(substring(text, CAST((i % n) + 1 AS INTEGER), 1)) END AS byte
        |      FROM b)
        |SELECT doc_id, CAST(48 AS BIGINT) AS byte_len,
        |       CAST(min(CASE WHEN i = 0 THEN byte END) AS INTEGER) AS first_byte,
        |       round(sum(byte) / 48.0, 6) AS mean_byte
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
