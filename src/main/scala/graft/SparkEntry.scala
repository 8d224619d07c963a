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

  private val modules: Seq[QueryModule] = Seq(
    Medallion, Relational, EventAnalytics, TextAnalytics, Dedup, Similarity, Multimodal, Skew,
    AsOf, RangeJoin, Sampling, Scrub, Curation, Cluster, Retrieval, Tokenizer, Expectations)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's full silver+gold operator chain (scan → null-filter →
    * dedup → when/otherwise → group-count), `glue/etl_api.py:24-45`. */
  def entry(spark: SparkSession): DataFrame =
    Medallion.medallionGold(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for q39/q40/q53/q108, whose
    * Spark-specific hash functions / data-trained codebooks and sketches
    * are not SQL-expressible; those are recall- or error-bound-checked
    * against their exact counterparts in ScalaTest, AND hash-gated via the
    * oracled audit twins q190/q191/q192 (LSH replayed from the md5 plane
    * constants; IVF/PQ audited through seeded SQL-replayable quantizers
    * with the identical probe/ADC machinery). (q36 MinHash-LSH IS oracled:
    * the banded bucket join replays in DuckDB on raw band signatures.) */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
