package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine surface is assembled from per-domain [[QueryModule]]s:
  *   - [[operators.Medallion]]      — the reference's bronze→silver→gold
  *     pipeline operators (`glue/etl_api.py:24-49`) as parity queries;
  *   - [[operators.Relational]]     — joins/aggregates/windows/set-ops core;
  *   - [[operators.EventAnalytics]] — tumbling/sliding/session event-time;
  *   - [[operators.TextAnalytics]]  — token/quality/lang-id/fingerprint;
  *   - [[operators.Dedup]]          — exact / n-gram / MinHash-LSH / SimHash
  *     / embedding-cosine dedup;
  *   - [[operators.Similarity]]     — cosine top-k + LSH/IVF ANN;
  *   - [[operators.Multimodal]]     — binary payload + metadata plumbing;
  *   - [[operators.Skew]]           — salted aggregation for hot keys;
  *   - [[operators.AsOf]]           — as-of (most-recent-marker) join;
  *   - [[operators.Sampling]]       — deterministic hash sampling, mixture
  *     planning, context-window packing, holdout split, training order;
  *   - [[operators.Scrub]]          — pattern scrubbing, repetition metrics,
  *     curriculum bucketing;
  *   - [[operators.Curation]]       — duplicated-span fraction, normalized
  *     dedup, incremental batch-vs-corpus dedup, per-source caps;
  *   - [[operators.Cluster]]        — near-dup cluster collapse via
  *     large-star/small-star connected components + survivor selection;
  *   - [[operators.Retrieval]]      — inverted-index keyword retrieval:
  *     TF-IDF top terms, BM25 ranking, conjunctive posting intersection;
  *   - [[operators.Tokenizer]]      — tokenizer-induction statistics: BPE
  *     adjacent-pair merge candidates, PMI collocations.
  */
object SparkEntry {

  private[graft] val modules: Seq[QueryModule] = Seq(
    Medallion, Relational, EventAnalytics, TextAnalytics, Dedup, Similarity, Multimodal, Skew,
    AsOf, RangeJoin, Sampling, Scrub, Curation, Cluster, Retrieval, Tokenizer, Expectations,
    graft.streaming.StreamParity)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's full silver+gold operator chain (scan → null-filter →
    * dedup → when/otherwise → group-count), `glue/etl_api.py:24-45`. */
  def entry(spark: SparkSession): DataFrame =
    Medallion.medallionGold(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — since round 16 for EVERY key. Precision on
    * the claim: two queries (q53, q196) carry ASSERTED-FLAG oracles — the
    * sketch-verdict flag columns are literal 1s the oracle asserts rather
    * than replays (sketch registers are engine-internal), so those columns
    * catch Spark-side drift only; since round 18 every value FEEDING the
    * asserted comparisons (exact distinct counts, exact percentiles, exact
    * median) rides along and is independently replayed, narrowing the
    * asserted surface to just the sketch-internal registers, and raw-sketch
    * accuracy is additionally ScalaTest-pinned (q150 remains q53's fully
    * exact twin). Every remaining oracle on the surface replays the full
    * computation. Every ANN tier is oracled directly: q39's md5-plane
    * LSH replays in DuckDB verbatim, and q40/q108 register their SEEDED,
    * SQL-replayable quantizer variants as the primary oracled paths while
    * the Lloyd's-trained variants are served from the session model layer
    * and recall-gated in DedupSimilaritySpec. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
