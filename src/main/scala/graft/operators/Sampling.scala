package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Training-data sampling and packing over the `documents` corpus — the
  * operations that sit between curation and the training loop of an LLM
  * data pipeline:
  *
  *  1. deterministic stratified hash sampling (q63) — per-stratum keep
  *     rates applied via a content hash, not `rand()`: reruns, retries and
  *     different cluster layouts all select the SAME rows, which is what
  *     makes a 100 TB sampling job idempotent and auditable;
  *  2. mixture-rate planning (q64) — given per-language corpus counts,
  *     compute the downsampling rate per language that balances the mix to
  *     the smallest stratum (the "uniform mixture" plan); and
  *     temperature-scaled mixture shares (q101) — p_s ∝ n_s^0.7, the
  *     UniMax-style compromise between proportional and uniform sampling
  *     that keeps big sources from dominating without over-repeating the
  *     small ones;
  *  3. context-window packing (q65) — assign documents to fixed token-budget
  *     chunks per language by running token count, the deterministic
  *     sequential-fill layout used to batch documents into training windows;
  *  4. train/val/test split (q68) — every row hashes itself into a split
  *     (salted so the split is independent of the q63 sampling hash), the
  *     standard leak-proof holdout: membership is a pure function of the
  *     key, so re-runs, late-arriving shards and incremental appends can
  *     never move a document across the boundary;
  *  5. sharded training order (q70) — the global shuffle a training loader
  *     consumes: hash-assign each document to a shard, order within the
  *     shard by a second content hash. Deliberately NOT a global
  *     `row_number` (an unpartitioned window serializes the corpus through
  *     one task); per-shard numbering keeps every window partition-parallel
  *     while round-robin reads over shards reproduce a uniform global order.
  *
  * Scale design: q63 is a pure per-row filter (no shuffle at all — the
  * sampling decision is row-local); q64 reduces to |languages| rows with
  * map-side partial counts; q65's only wide operation is the window sort on
  * (lang, doc_id) — one shuffle, and the running sum is a single streaming
  * pass per partition; q68 is row-local + a |lang×split|-row group-by; q70
  * shuffles once on the shard key. Nothing materializes driver-side.
  */
object Sampling extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.read(s, dir, "documents")

  /** Per-language keep rates for the stratified sample: en is kept at 90%,
    * the mid-resource languages at half, the long tail at a quarter. */
  val SampleRates: Map[String, Double] = Map("en" -> 0.9, "de" -> 0.5, "fr" -> 0.5)
  val DefaultRate = 0.25

  /** Uniform hash in [0, 1): first 8 hex chars of md5(doc_id) over 2^32.
    * md5 (not xxhash64) so the DuckDB oracle replays the sample exactly. */
  def hashUniform(docId: Column): Column =
    expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) AS bigint)")
      .cast("double") / lit(4294967296.0)

  /** q63: the stratified sample — keep a row iff its content hash falls
    * under its language's rate. Row-local, shuffle-free, idempotent. */
  def hashSample(s: SparkSession, dir: String): DataFrame = {
    val rate = SampleRates.foldLeft(lit(DefaultRate)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    docs(s, dir)
      .withColumn("u", round(hashUniform(col("doc_id")), 6))
      .filter(hashUniform(col("doc_id")) < rate)
      .select(col("doc_id"), col("lang"), col("u"))
  }

  /** q111: fixed-COUNT-per-stratum sample — exactly `n` docs per source,
    * chosen by content-hash order (the complement of q63's rate-based
    * sample: eval/calibration sets need "exactly 10k per language", not
    * "roughly 25%"). Deterministic and append-stable under corpus growth
    * ONLY for surviving rows' identity being hash-ordered (a new doc can
    * displace the current max — by design: the sample is always the n
    * hash-smallest, so any two runs over the same corpus agree exactly).
    * Scale: one shuffle on `source` for the per-stratum `row_number`; at
    * extreme per-stratum cardinality the same plan runs as a per-partition
    * top-n (rank ≤ n survives partial aggregation) — Spark already prunes
    * with WindowGroupLimit below the window sort. */
  def stratumTopN(s: SparkSession, dir: String, n: Int = 40): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("u_exact"), col("doc_id"))
    docs(s, dir)
      .withColumn("u_exact", hashUniform(col("doc_id")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
      .select(col("source"), col("rn"), col("doc_id"), round(col("u_exact"), 6).as("u"))
  }

  /** q118: weighted priority sample — Efraimidis–Spirakis (2006)
    * "Weighted random sampling with a reservoir" via the exponential-key
    * trick: each row draws priority key −ln(u)/w (u = the content hash,
    * w = n_chars), and the n SMALLEST keys form a sample where inclusion
    * probability tracks weight — heavy (long) documents are
    * proportionally favored, exactly the "sample by token mass, not doc
    * count" draw a mixture audit wants. Deterministic: u is the md5 hash
    * (rerun-identical), keys are rounded at 9 dp before ranking (libm ln
    * may differ in the last ulp across engines), ties break on doc_id.
    * One bounded top-n over row-local math — `TakeOrderedAndProject`, no
    * corpus sort, no state; the reservoir formulation streams the same
    * keys when the data does not fit a sort. */
  def weightedPrioritySample(s: SparkSession, dir: String, n: Int = 50): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        // +1e-12 floors u away from ln(0) = −∞ (a hash of exactly zero);
        // identical on both engines so the keys still agree bit-for-bit
        round(-log(hashUniform(col("doc_id")) + lit(1e-12)) / col("n_chars"), 9).as("k"))
      .orderBy(col("k"), col("doc_id"))
      .limit(n)

  /** Overlapping token-window chunking (the context-prep step a RAG /
    * training pipeline runs before embedding or packing): windows of
    * `chunk` tokens starting every `stride` tokens, so consecutive chunks
    * share `chunk - stride` tokens and no token span longer than the
    * overlap is ever split across a chunk boundary. Entirely ROW-LOCAL —
    * the token array is let-bound once per document and the windows are an
    * index-sequence transform inside the row; the explode multiplies rows
    * ~len/stride-fold but nothing shuffles. A document shorter than one
    * window yields exactly one (short) chunk. */
  def chunkOverlap(docsDf: DataFrame, chunk: Int = 64, stride: Int = 48): DataFrame =
    docsDf
      .select(col("doc_id"), explode(expr(
        s"""flatten(transform(array(split(trim(text), ' ')),
           |  w -> transform(
           |         sequence(0, CASE WHEN size(w) <= $chunk THEN 0
           |                      ELSE cast(ceil(cast(size(w) - $chunk AS double) / $stride) AS int) END),
           |         j -> struct(cast(j AS bigint) AS chunk_id,
           |                     slice(w, j * $stride + 1, $chunk) AS c))))""".stripMargin)).as("p"))
      .select(col("doc_id"), col("p.chunk_id"),
        size(col("p.c")).cast("long").as("n_tokens"),
        array_join(col("p.c"), " ").as("chunk_text"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Neyman optimal audit allocation (q307): how a fixed manual-review
    // budget (B = 1000 docs) SHOULD split across sources — n_i ∝ N_i·σ_i,
    // the stratified-sampling allocation that minimizes the variance of
    // the corpus-wide quality estimate (Neyman 1934). The planning readout
    // beside q63's fixed keep-rates: a source that is big but homogeneous
    // (tiny σ) deserves fewer audits than proportional allocation gives
    // it; a small volatile source deserves more. σ from the q232 decimal
    // moment discipline in ONE corpus pass; the allocation algebra runs on
    // the bounded per-source frame (proportional column included for the
    // contrast).
    "q307_neyman_allocation" -> ((s, dir) => {
      val dec9 = DecimalType(38, 9); val dec12 = DecimalType(38, 12)
      val q = TextAnalytics.qualityScore
      val per = docs(s, dir)
        .select(col("source"), q.as("q"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("q").cast(DecimalType(38, 6))).cast("double")
            / count(lit(1)), 9).as("m"),
          round(sum(round(col("q") * col("q"), 12).cast(dec12)).cast("double")
            / count(lit(1)), 9).as("s2"))
        .select(col("source"), col("n"), col("m"),
          round(sqrt(round((col("s2") - col("m") * col("m"))
            * (col("n").cast("double") / (col("n") - lit(1L))), 12)), 9).as("sigma"))
        .select(col("source"), col("n"), col("m"), col("sigma"),
          round(col("n") * col("sigma"), 9).as("w"))
        .localCheckpoint()
      val tot = per.agg(sum(col("w").cast(dec9)).as("wt"),
        sum(col("n")).as("nn"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n").as("n_docs"),
          col("m").as("mean_quality"), col("sigma"),
          round(lit(1000.0) * col("w") / col("wt").cast("double"), 6)
            .as("neyman_alloc"),
          round(lit(1000.0) * col("n") / col("nn"), 6).as("prop_alloc"))
        .orderBy(col("source"))
    }),

    // Context-bucket padding waste (q168): the batch-planning report for a
    // bucketed-sequence training loop — each doc lands in the smallest
    // context bucket that holds it (overflowing docs truncate to the top
    // bucket), and the report prices the padding each bucket wastes and
    // the tokens truncation loses. This is the measurement that decides
    // bucket boundaries BEFORE q65's packing runs; row-local bucketing +
    // one bounded aggregation (output = bucket count).
    "q168_padding_waste" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
      val bucket = when(col("n_tokens") <= 16, 16L).when(col("n_tokens") <= 32, 32L)
        .when(col("n_tokens") <= 48, 48L).when(col("n_tokens") <= 64, 64L)
        .otherwise(96L)
      toks.withColumn("bucket", bucket)
        .withColumn("truncated", greatest(col("n_tokens") - 96L, lit(0L)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          sum(col("bucket") - least(col("n_tokens"), col("bucket"))).cast("long")
            .as("total_padding"),
          sum(col("truncated")).cast("long").as("tokens_truncated"),
          round(sum(col("bucket") - least(col("n_tokens"), col("bucket"))).cast("double")
            / sum(col("bucket")), 6).as("pad_ratio"))
        .orderBy(col("bucket"))
    }),

    // Context-length planning curve (q210): for each candidate context size
    // C, the corpus-wide cost of the two standard sequence-construction
    // strategies — one-doc-per-sequence (pad to C, truncate above C; the
    // q168 model generalized across C) vs GPT-style concatenation packing
    // (docs concatenate per language stream and split across sequence
    // boundaries, so the only padding is each stream's final partial
    // sequence: seqs = ceil(kept_tokens / C) per lang). The report is the
    // table a pretraining run reads to pick C: truncation loss rises with
    // smaller C, padding waste rises with larger C, and packing efficiency
    // quantifies what concatenation buys at each point. Integer ceil via
    // (kept + C - 1) div C — no float rounding in the sequence counts.
    // Scale shape: docs cross-join a 4-row literal size table (broadcast),
    // then ONE (context, lang)-keyed aggregation with map-side partials and
    // a context-keyed rollup — output is |sizes| rows.
    "q210_packing_curve" -> ((s, dir) => {
      val n = TextAnalytics.nTokens(col("text"))
      val sizes = broadcast(
        s.range(1).select(explode(array(lit(32L), lit(64L), lit(128L), lit(256L)))
          .as("context")))
      val perLang = docs(s, dir).select(col("lang"), n.as("n"))
        .crossJoin(sizes)
        .groupBy(col("context"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n") > col("context"), 1L).otherwise(0L)).as("n_trunc"),
          sum(col("n")).as("total"),
          sum(least(col("n"), col("context"))).as("kept"))
        .withColumn("seqs", expr("(kept + context - 1) div context"))
      perLang.groupBy(col("context"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_trunc")).as("n_docs_trunc"),
          sum(col("total")).as("tokens_total"),
          sum(col("kept")).as("tokens_kept"),
          sum(col("n_docs") * col("context") - col("kept")).as("pad_unpacked"),
          sum(col("seqs")).as("seqs_packed"))
        .select(col("context"), col("n_docs"), col("n_docs_trunc"),
          col("tokens_total"), col("tokens_kept"), col("pad_unpacked"),
          col("seqs_packed"),
          round(col("tokens_kept").cast("double") /
            (col("n_docs") * col("context")), 6).as("eff_unpacked"),
          round(col("tokens_kept").cast("double") /
            (col("seqs_packed") * col("context")), 6).as("eff_packed"))
        .orderBy(col("context"))
    }),

    // Token-budget mixture materialization (q213): compile the q101
    // temperature-mixture PLAN into an actual admission ledger. Each source
    // gets target_tokens = floor(temp_share · B) of a fixed corpus budget
    // (B = 10,000 here); documents are admitted per source in a
    // content-independent md5 hash order (the q88 cap convention — stable
    // under re-partitioning, re-ingestion order, and appends) while their
    // PRECEDING running token count is still under target (the q65
    // start-offset rule, so the ledger overshoots by at most one document
    // instead of stalling under it). This is the missing step between a
    // mixture-design row ("give wiki 12%") and a training manifest
    // ("these documents, in this order") — and because admission is
    // hash-ordered, re-running after an append admits a superset, never a
    // reshuffle. Scale shape: one grouped pass for shares (|sources| rows),
    // a source-partitioned window for the running count (partition-parallel;
    // a mega-source serializes its own stream only), one grouped rollup.
    // DoReMi-style domain reweighting (q239) — mixture weights from excess
    // difficulty (Xie et al. 2023, "DoReMi: Optimizing Data Mixtures
    // Speeds Up Language Model Pretraining", one multiplicative-update
    // step with the corpus's own unigram LM standing in for the proxy
    // model): a source whose tokens are MORE surprising than the corpus
    // average (lower mean log-prob — rarer vocabulary, i.e. the
    // underfit/underrepresented domain) is upweighted by
    // w ∝ 10^(corpus_mean − source_mean), then normalized. The q73 scoring
    // layer computes per-token log10 p under the corpus unigram counts;
    // per-source means are decimal-space sums of 12-dp-rounded terms
    // (order-independent, the q206 convention), the exponential is taken
    // on the 6-dp-rounded excess, and normalization decimal-sums the
    // 6-dp-rounded raw weights — every float both engines see derives
    // from the same rounded scalars. Scale: one broadcast frequency
    // rejoin (exploded tokens never shuffle), two |sources|-row rollups.
    "q239_doremi_weights" -> ((s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 12)
      val toks = docs(s, dir)
        .select(col("source"), explode(split(trim(col("text")), " ")).as("tok"))
      val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val tot = freq.agg(sum(col("cnt")).as("total"))
      val sc = toks.join(broadcast(freq), Seq("tok")).crossJoin(broadcast(tot))
        .select(col("source"),
          round(log10(col("cnt").cast("double") / col("total")), 12).as("lp"))
      val per = sc.groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          round(sum(col("lp").cast(dec)).cast("double") / count(lit(1)), 6)
            .as("mean_logprob"))
      val all = sc.agg(
        round(sum(col("lp").cast(dec)).cast("double") / count(lit(1)), 6)
          .as("corpus_mean"))
      val raw = per.crossJoin(broadcast(all))
        .withColumn("excess", round(col("corpus_mean") - col("mean_logprob"), 6))
        .withColumn("w_raw", round(pow(lit(10.0), col("excess")), 6))
      val tw = raw.agg(
        sum(col("w_raw").cast(org.apache.spark.sql.types.DecimalType(28, 6))).as("tot_w"))
      raw.crossJoin(broadcast(tw))
        .select(col("source"), col("n_tokens"), col("mean_logprob"), col("excess"),
          round(col("w_raw").cast("double") / col("tot_w").cast("double"), 6).as("weight"))
        .orderBy(col("source"))
    }),

    // UniMax budget allocation (q238) — the mixture tier ABOVE q101's
    // temperature shares: given a total token budget B = floor(0.9 · corpus)
    // and a per-source repeat cap of 1 epoch (cap_s = n_s — the UniMax
    // N=1 setting), allocate the budget so every source gets an equal
    // share EXCEPT the ones whose cap binds: the smallest sources are
    // served whole, the large ones truncate to the common share (Chung et
    // al. 2023, "UniMax: Fairer and More Effective Language Sampling" —
    // the allocation that avoids both proportional sampling's head
    // domination and uniform sampling's tail over-repetition). The sequential water-filling loop has a
    // closed form over the cap-ascending order: a prefix of sources is
    // capped, the rest split the remainder equally — computed here as two
    // window passes (running cap-sum → bind flag; running min → the
    // prefix) plus one scalar rejoin, all in INTEGER space until the final
    // division, so both engines replay it bit-for-bit. Windows run over
    // the |sources|-row rollup, never the corpus (AuditSpec-classified).
    "q238_unimax_alloc" -> ((s, dir) => {
      val per = docs(s, dir).groupBy(col("source"))
        .agg(sum(TextAnalytics.nTokens(col("text"))).as("n_tokens"))
      val tot = per.agg(sum(col("n_tokens")).as("tot"), count(lit(1)).as("n_src"))
      val base = per.crossJoin(broadcast(tot))
        .withColumn("cap", col("n_tokens"))
        .withColumn("budget", floor(col("tot") * 9 / lit(10.0)).cast("long"))
      val asc = Window.orderBy(col("cap"), col("source"))
      val flagged = base
        .withColumn("rn", row_number().over(asc).cast("long"))
        .withColumn("cum", coalesce(sum(col("cap"))
          .over(asc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("flag",
          when(col("cap") * (col("n_src") - col("rn") + 1) + col("cum") <= col("budget"), 1L)
            .otherwise(0L))
        .withColumn("capped",
          min(col("flag")).over(asc.rowsBetween(Window.unboundedPreceding, 0)))
      val sums = flagged.agg(
        sum(when(col("capped") === 1, col("cap")).otherwise(0L)).as("capsum"),
        sum(col("capped")).as("t"))
      flagged.crossJoin(broadcast(sums))
        .withColumn("alloc_tokens",
          when(col("capped") === 1, col("cap").cast("double"))
            .otherwise(round((col("budget") - col("capsum")).cast("double")
              / (col("n_src") - col("t")), 6)))
        .withColumn("epochs", round(col("alloc_tokens") / col("n_tokens"), 6))
        .select(col("source"), col("n_tokens"), col("cap").as("cap_tokens"),
          col("capped"), col("alloc_tokens"), col("epochs"))
        .orderBy(col("source"))
    }),

    "q213_mixture_materialize" -> ((s, dir) => {
      val budget = 10000L
      val n = TextAnalytics.nTokens(col("text"))
      val t = docs(s, dir).groupBy(col("source"))
        .agg(sum(n).as("src_tokens"))
        .withColumn("wt", round(pow(col("src_tokens").cast("double"), 0.7), 6)
          .cast("decimal(28,6)"))
      val tot = t.agg(sum(col("wt")).as("tot_w"))
      val targets = t.crossJoin(broadcast(tot))
        .select(col("source"),
          floor(round(col("wt").cast("double") / col("tot_w").cast("double"), 6)
            * budget).cast("long").as("target_tokens"))
      val ordered = docs(s, dir)
        .select(col("source"), n.as("n"),
          md5(concat(col("doc_id").cast("string"), lit(":mix"))).as("ok"))
      val w = Window.partitionBy(col("source")).orderBy(col("ok"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val run = ordered.withColumn("pre", sum(col("n")).over(w) - col("n"))
        .join(broadcast(targets), Seq("source"))
      run.groupBy(col("source"), col("target_tokens"))
        .agg(count(lit(1)).as("n_docs_total"),
          sum(when(col("pre") < col("target_tokens"), 1L).otherwise(0L)).as("n_admitted"),
          sum(when(col("pre") < col("target_tokens"), col("n")).otherwise(0L))
            .as("tokens_admitted"))
        .select(col("source"), col("n_docs_total"), col("n_admitted"),
          col("tokens_admitted"), col("target_tokens"),
          // zero-target guard: a source whose 6-dp share floors to zero of
          // the budget reports NULL, not Infinity (DuckDB x/0 differs)
          when(col("target_tokens") === 0L, lit(null).cast("double"))
            .otherwise(round(col("tokens_admitted").cast("double")
              / col("target_tokens"), 6)).as("realized_ratio"))
        .orderBy(col("source"))
    }),

    // Proportional curriculum interleave (q215): compile the q101 mixture
    // WEIGHTS into an actual global training order by stride scheduling
    // (Waldspurger & Weihl, OSDI '94 — the deterministic form of lottery
    // scheduling): each document's virtual time is its content-hash rank
    // within its source divided by the source's temperature weight, and the
    // training order is ascending virtual time. Sources then interleave
    // proportionally to weight BY CONSTRUCTION — no RNG, no global shuffle
    // epoch — and the order is append-stable (a new doc inserts at its own
    // vtime; earlier positions never reorder). Registered as the first-100
    // prefix: the engine plans a bounded TakeOrderedAndProject (top-k heap
    // per partition), never a corpus-wide single-partition sort; position
    // numbering then runs over the 100-row prefix only.
    "q215_curriculum_interleave" -> ((s, dir) => {
      val n = TextAnalytics.nTokens(col("text"))
      val wt = docs(s, dir).groupBy(col("source"))
        .agg(round(pow(sum(n).cast("double"), 0.7), 6).as("wt"))
      val rk = Window.partitionBy(col("source"))
        .orderBy(md5(concat(col("doc_id").cast("string"), lit(":order"))))
      val v = docs(s, dir)
        .select(col("doc_id"), col("source"))
        .withColumn("rank_in_src", row_number().over(rk).cast("long"))
        .join(broadcast(wt), Seq("source"))
        .select(col("doc_id"), col("source"),
          round(col("rank_in_src").cast("double") / col("wt"), 9).as("vtime"))
      val top = v.orderBy(col("vtime"), col("source"), col("doc_id")).limit(100)
      top.withColumn("pos",
        row_number().over(Window.orderBy(col("vtime"), col("source"), col("doc_id")))
          .cast("long"))
        .select(col("pos"), col("doc_id"), col("source"), col("vtime"))
        .orderBy(col("pos"))
    }),

    "q63_hash_sample" -> ((s, dir) =>
      hashSample(s, dir).orderBy(col("doc_id"))),

    // Fixed-count-per-stratum sample (see stratumTopN).
    "q111_stratum_topn" -> ((s, dir) =>
      stratumTopN(s, dir).orderBy(col("source"), col("rn"))),

    // Weighted priority sample (see weightedPrioritySample).
    "q118_weighted_sample" -> ((s, dir) =>
      weightedPrioritySample(s, dir)),

    // Temperature-scaled mixture shares (q101): the UniMax / multilingual-
    // sampling rule p_s ∝ n_s^T (T = 0.7 here): between proportional (T=1,
    // big sources dominate) and uniform (T=0, small sources over-repeat).
    // Reduces to |sources| rows with map-side partial counts; the pow()
    // weight is rounded at 6 dp and summed in DECIMAL space so the
    // normalizing total is exact and order-independent, then both shares
    // divide as identical doubles on any engine.
    "q101_temperature_mix" -> ((s, dir) => {
      val t = docs(s, dir).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalytics.nTokens(col("text"))).as("n_tokens"))
        .withColumn("wt", round(pow(col("n_tokens").cast("double"), 0.7), 6)
          .cast("decimal(28,6)"))
      val tots = t.agg(sum(col("n_tokens")).as("tot_tokens"), sum(col("wt")).as("tot_w"))
      t.crossJoin(broadcast(tots))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast("double") / col("tot_tokens"), 6).as("raw_share"),
          round(col("wt").cast("double") / col("tot_w").cast("double"), 6).as("temp_share"))
        .orderBy(col("source"))
    }),

    // Downsample-to-smallest mixture plan: rate(lang) = min stratum / stratum.
    // The unpartitioned window runs AFTER the group-by, over |languages|
    // rows — the single-partition warning it triggers is about those few
    // rows, not the corpus.
    "q64_mixture_rates" -> ((s, dir) =>
      docs(s, dir).groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .withColumn("rate",
          round(min(col("n_docs")).over(Window.partitionBy())
            .cast("double") / col("n_docs"), 6))
        .select(col("lang"), col("n_docs"), col("rate"))
        .orderBy(col("lang"))),

    // Sequential-fill packing: chunk b holds the docs whose RUNNING token
    // count (per language, doc_id order) starts inside [b*512, (b+1)*512).
    "q65_pack_chunks" -> ((s, dir) => {
      val n = TextAnalytics.nTokens(col("text"))
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, dir)
        .select(col("doc_id"), col("lang"), n.as("n"))
        .withColumn("chunk_id",
          floor((sum(col("n")).over(w) - col("n")).cast("double") / lit(512.0)).cast("long"))
        .groupBy(col("lang"), col("chunk_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("chunk_tokens"))
        .orderBy(col("lang"), col("chunk_id"))
    }),

    // Leak-proof holdout: bucket = md5(doc_id || ':split') mod 100 →
    // 80/10/10. The ':split' salt decorrelates holdout membership from the
    // q63 sampling hash (same key, different hash → independent decisions).
    "q68_split_assign" -> ((s, dir) => {
      val b = expr(
        "cast(conv(substring(md5(concat(cast(doc_id as string), ':split')), 1, 4), 16, 10) as bigint) % 100")
      docs(s, dir)
        .select(col("lang"),
          when(b < 80, lit("train")).when(b < 90, lit("val")).otherwise(lit("test")).as("split"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"), col("split"))
    }),

    // Sharded training order: shard by one content hash, order within the
    // shard by another — windows stay partition-parallel (see scaladoc).
    // Epochs-to-exhaustion (q284): for the q101 temperature-weighted
    // mixture (T=0.7) and a declared per-epoch token budget of 1M, how
    // many global epochs until each source's tokens run out — the
    // repeat-data planning table (Muennighoff et al. 2023: data repeated
    // past ~4 epochs stops helping) a mixture designer reads next to the
    // shares. Sources with epochs < 1 repeat within a single epoch. One
    // grouped pass; the q101 weight convention verbatim so the two
    // queries can never disagree on the shares.
    "q284_epochs_to_exhaustion" -> ((s, dir) => {
      val t = docs(s, dir).groupBy(col("source"))
        .agg(sum(TextAnalytics.nTokens(col("text"))).as("n_tokens"))
        .withColumn("wt", round(pow(col("n_tokens").cast("double"), 0.7), 6)
          .cast("decimal(28,6)"))
      val tots = t.agg(sum(col("wt")).as("tot_w"))
      val budget = 1000000.0
      t.crossJoin(broadcast(tots))
        .select(col("source"), col("n_tokens"),
          round(col("wt").cast("double") / col("tot_w").cast("double"), 6).as("temp_share"))
        .select(col("source"), col("n_tokens"), col("temp_share"),
          round(col("temp_share") * budget, 6).as("tokens_per_epoch"),
          round(col("n_tokens").cast("double") / (col("temp_share") * budget), 6)
            .as("epochs_to_exhaustion"))
        .withColumn("repeats_within_epoch",
          when(col("epochs_to_exhaustion") < 1.0, 1L).otherwise(0L))
        .orderBy(col("epochs_to_exhaustion"), col("source"))
    }),

    // Epoch-shuffle decorrelation (q286): the data-loader QC that q70's
    // single seeded order can't give — successive epochs must reshuffle
    // INDEPENDENTLY (a correlated shuffle feeds the model near-identical
    // batch curricula every epoch). Per q70 shard, documents are ranked
    // under three epoch-salted md5 orders and each epoch pair's Spearman
    // rho comes from the exact integer identity 1 − 6Σd²/(n(n²−1)) —
    // near-zero rho = independent shuffles. All windows partition by the
    // shard key; rank diffs square in decimal space.
    "q286_epoch_shuffles" -> ((s, dir) => {
      val shard = expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as bigint) % 8")
      val base = docs(s, dir).select(col("doc_id"), shard.as("shard"))
      def ranks(e: Int): DataFrame =
        base.select(col("doc_id"), col("shard"),
            md5(concat(lit(s"$e:"), col("doc_id").cast("string"))).as("ok"))
          .withColumn("r", row_number().over(
            Window.partitionBy(col("shard")).orderBy(col("ok"), col("doc_id"))).cast(LongType))
          .select(col("doc_id"), col("shard"), col("r"))
      val rk = Seq(0, 1, 2).map(ranks)
      val pairs = Seq((0, 1), (0, 2), (1, 2)).map { case (a, b) =>
        // rank diff cast to decimal BEFORE squaring (q266 convention):
        // d² overflows Long once shards reach ~3e9 rows
        val d = (col("ra") - col("rb")).cast(DecimalType(19, 0))
        rk(a).select(col("doc_id"), col("shard"), col("r").as("ra"))
          .join(rk(b).select(col("doc_id"), col("r").as("rb")), "doc_id")
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n"),
            sum(d * d).cast("double").as("sd2"))
          .select(lit(a.toLong).as("epoch_a"), lit(b.toLong).as("epoch_b"),
            col("shard"), col("n"),
            round(lit(1.0) - lit(6.0) * col("sd2")
              / (col("n").cast("double") * (col("n").cast("double") * col("n") - lit(1.0))), 6)
              .as("rho"))
      }
      pairs.reduce(_ unionByName _)
        .orderBy(col("epoch_a"), col("epoch_b"), col("shard"))
    }),

    "q70_training_order" -> ((s, dir) => {
      val orderKey = md5(col("doc_id").cast("string"))
      val shard = expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as bigint) % 8")
      docs(s, dir)
        .select(col("doc_id"), col("lang"), orderKey.as("ok"), shard.as("shard"))
        .withColumn("pos",
          row_number().over(Window.partitionBy(col("shard"))
            .orderBy(col("ok"), col("doc_id"))).cast("long"))
        .select(col("shard"), col("pos"), col("doc_id"), col("lang"))
        .orderBy(col("shard"), col("pos"))
    }),

    // Overlapping 64-token windows, stride 48 (16-token overlap).
    "q83_chunk_overlap" -> ((s, dir) =>
      chunkOverlap(docs(s, dir))
        .orderBy(col("doc_id"), col("chunk_id"))),

    // Sharded-export manifest (q203): the VERIFIABLE summary a distributed
    // training-data writer publishes alongside its shards — per shard
    // (q70's seeded hash assignment, so the manifest names the same shards
    // the export writes): document count, whitespace-token and byte
    // volumes, and an order-independent content checksum (bit_xor of each
    // doc's md5-prefix fingerprint — XOR so any task/partition order
    // produces the identical checksum, and a single flipped/missing/extra
    // document flips it). A consumer re-derives the manifest from the
    // delivered shards and compares — the standard trust-but-verify
    // handshake between an export job and the training loader. One
    // map-side-combined aggregation; nothing shuffles but 8 shard rows.
    "q203_export_manifest" -> ((s, dir) =>
      docs(s, dir)
        .select(
          expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as bigint) % 8")
            .as("shard"),
          TextAnalytics.nTokens(col("text")).as("toks"),
          octet_length(col("text")).cast("long").as("bytes"),
          expr("cast(conv(substring(md5(text), 1, 8), 16, 10) as bigint)").as("fp"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("n_tokens"),
          sum(col("bytes")).as("n_bytes"),
          bit_xor(col("fp")).as("content_fp"))
        .orderBy(col("shard")))
  )

  val oracles: Map[String, String] = Map(
    "q307_neyman_allocation" ->
      """WITH qd AS (SELECT source,
        |              round(0.5 * least(1.0, length(text) / 500.0)
        |                  + 0.3 * (CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to|is)\b')) AS DOUBLE) /
        |                           len(string_split(trim(text), ' ')))
        |                  + 0.2 * (1.0 - CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) /
        |                           length(text)), 6) AS q
        |            FROM documents),
        |per AS (SELECT source, count(*) AS n,
        |          round(CAST(sum(CAST(q AS DECIMAL(38,6))) AS DOUBLE) / count(*), 9) AS m,
        |          round(CAST(sum(CAST(round(q * q, 12) AS DECIMAL(38,12))) AS DOUBLE) / count(*), 9) AS s2
        |        FROM qd GROUP BY 1),
        |sg AS (SELECT source, n, m,
        |         round(sqrt(round((s2 - m * m) * (CAST(n AS DOUBLE) / (n - 1)), 12)), 9) AS sigma
        |       FROM per),
        |wf AS (SELECT source, n, m, sigma, round(n * sigma, 9) AS w FROM sg),
        |tot AS (SELECT sum(CAST(w AS DECIMAL(38,9))) AS wt, CAST(sum(n) AS BIGINT) AS nn FROM wf)
        |SELECT source, n AS n_docs, m AS mean_quality, sigma,
        |       round(1000.0 * w / CAST(wt AS DOUBLE), 6) AS neyman_alloc,
        |       round(1000.0 * n / nn, 6) AS prop_alloc
        |FROM wf CROSS JOIN tot ORDER BY source""".stripMargin,
    "q284_epochs_to_exhaustion" ->
      """WITH t AS (SELECT source,
        |             CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
        |           FROM documents GROUP BY 1),
        |w AS (SELECT source, n_tokens,
        |        CAST(round(pow(CAST(n_tokens AS DOUBLE), 0.7), 6) AS DECIMAL(28,6)) AS wt
        |      FROM t),
        |tot AS (SELECT sum(wt) AS tot_w FROM w),
        |sh AS (SELECT source, n_tokens,
        |         round(CAST(wt AS DOUBLE) / CAST(tot_w AS DOUBLE), 6) AS temp_share
        |       FROM w CROSS JOIN tot)
        |SELECT source, n_tokens, temp_share,
        |       round(temp_share * 1000000.0, 6) AS tokens_per_epoch,
        |       round(CAST(n_tokens AS DOUBLE) / (temp_share * 1000000.0), 6) AS epochs_to_exhaustion,
        |       CAST(CASE WHEN round(CAST(n_tokens AS DOUBLE) / (temp_share * 1000000.0), 6) < 1.0
        |                 THEN 1 ELSE 0 END AS BIGINT) AS repeats_within_epoch
        |FROM sh ORDER BY epochs_to_exhaustion, source""".stripMargin,
    "q286_epoch_shuffles" ->
      """WITH base AS (SELECT doc_id,
        |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 8 AS shard
        |  FROM documents),
        |r0 AS (SELECT doc_id, shard, row_number() OVER (PARTITION BY shard
        |         ORDER BY md5('0:' || CAST(doc_id AS VARCHAR)), doc_id) AS r FROM base),
        |r1 AS (SELECT doc_id, shard, row_number() OVER (PARTITION BY shard
        |         ORDER BY md5('1:' || CAST(doc_id AS VARCHAR)), doc_id) AS r FROM base),
        |r2 AS (SELECT doc_id, shard, row_number() OVER (PARTITION BY shard
        |         ORDER BY md5('2:' || CAST(doc_id AS VARCHAR)), doc_id) AS r FROM base),
        |p01 AS (SELECT CAST(0 AS BIGINT) AS epoch_a, CAST(1 AS BIGINT) AS epoch_b, a.shard,
        |          count(*) AS n,
        |          CAST(sum(CAST(a.r - b.r AS DECIMAL(19,0)) * CAST(a.r - b.r AS DECIMAL(19,0))) AS DOUBLE) AS sd2
        |        FROM r0 a JOIN r1 b USING (doc_id) GROUP BY 3),
        |p02 AS (SELECT CAST(0 AS BIGINT) AS epoch_a, CAST(2 AS BIGINT) AS epoch_b, a.shard,
        |          count(*) AS n,
        |          CAST(sum(CAST(a.r - b.r AS DECIMAL(19,0)) * CAST(a.r - b.r AS DECIMAL(19,0))) AS DOUBLE) AS sd2
        |        FROM r0 a JOIN r2 b USING (doc_id) GROUP BY 3),
        |p12 AS (SELECT CAST(1 AS BIGINT) AS epoch_a, CAST(2 AS BIGINT) AS epoch_b, a.shard,
        |          count(*) AS n,
        |          CAST(sum(CAST(a.r - b.r AS DECIMAL(19,0)) * CAST(a.r - b.r AS DECIMAL(19,0))) AS DOUBLE) AS sd2
        |        FROM r1 a JOIN r2 b USING (doc_id) GROUP BY 3),
        |u AS (SELECT * FROM p01 UNION ALL SELECT * FROM p02 UNION ALL SELECT * FROM p12)
        |SELECT epoch_a, epoch_b, shard, n,
        |       round(1.0 - 6.0 * sd2
        |             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * n - 1.0)), 6) AS rho
        |FROM u ORDER BY epoch_a, epoch_b, shard""".stripMargin,
    "q215_curriculum_interleave" ->
      """WITH t AS (SELECT doc_id, source, len(string_split(trim(text), ' ')) AS n,
        |             md5(CAST(doc_id AS VARCHAR) || ':order') AS ok FROM documents),
        |wt AS (SELECT source, round(pow(CAST(sum(n) AS DOUBLE), 0.7), 6) AS wt FROM t GROUP BY 1),
        |r AS (SELECT doc_id, t.source,
        |        CAST(row_number() OVER (PARTITION BY t.source ORDER BY ok) AS BIGINT) AS rank_in_src
        |      FROM t),
        |v AS (SELECT doc_id, r.source,
        |        round(CAST(rank_in_src AS DOUBLE) / wt, 9) AS vtime
        |      FROM r JOIN wt ON wt.source = r.source)
        |SELECT * FROM
        |  (SELECT CAST(row_number() OVER (ORDER BY vtime, source, doc_id) AS BIGINT) AS pos,
        |          doc_id, source, vtime FROM v)
        |WHERE pos <= 100 ORDER BY pos""".stripMargin,
    "q239_doremi_weights" ->
      """WITH toks AS (SELECT source, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
        |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
        |tot AS (SELECT count(*) AS total FROM toks),
        |sc AS (SELECT source,
        |         CAST(round(log10(CAST(cnt AS DOUBLE) / total), 12) AS DECIMAL(38,12)) AS lp
        |       FROM toks JOIN freq USING (tok) CROSS JOIN tot),
        |per AS (SELECT source, count(*) AS n_tokens,
        |          round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS mean_logprob
        |        FROM sc GROUP BY 1),
        |al AS (SELECT round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS corpus_mean FROM sc),
        |raw AS (SELECT source, n_tokens, mean_logprob,
        |          round(corpus_mean - mean_logprob, 6) AS excess,
        |          round(pow(10.0, round(corpus_mean - mean_logprob, 6)), 6) AS w_raw
        |        FROM per CROSS JOIN al),
        |tw AS (SELECT sum(CAST(w_raw AS DECIMAL(28,6))) AS tot_w FROM raw)
        |SELECT source, n_tokens, mean_logprob, excess,
        |       round(CAST(w_raw AS DOUBLE) / CAST(tot_w AS DOUBLE), 6) AS weight
        |FROM raw CROSS JOIN tw ORDER BY source""".stripMargin,
    "q238_unimax_alloc" ->
      """WITH per AS (SELECT source, CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
        |             FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot, count(*) AS n_src FROM per),
        |base AS (SELECT source, n_tokens, n_tokens AS cap,
        |           CAST(floor(tot * 9 / 10.0) AS BIGINT) AS budget, n_src
        |         FROM per CROSS JOIN tot),
        |f AS (SELECT *, CAST(row_number() OVER (ORDER BY cap, source) AS BIGINT) AS rn,
        |        CAST(COALESCE(sum(cap) OVER (ORDER BY cap, source
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
        |      FROM base),
        |g AS (SELECT *, CASE WHEN cap * (n_src - rn + 1) + cum <= budget
        |                     THEN 1 ELSE 0 END AS flag FROM f),
        |h AS (SELECT *, min(flag) OVER (ORDER BY cap, source
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS capped FROM g),
        |s AS (SELECT CAST(sum(CASE WHEN capped = 1 THEN cap ELSE 0 END) AS BIGINT) AS capsum,
        |        CAST(sum(capped) AS BIGINT) AS t FROM h)
        |SELECT source, n_tokens, cap AS cap_tokens, CAST(capped AS BIGINT) AS capped,
        |       CASE WHEN capped = 1 THEN CAST(cap AS DOUBLE)
        |            ELSE round(CAST(budget - capsum AS DOUBLE) / (n_src - t), 6)
        |       END AS alloc_tokens,
        |       round(CASE WHEN capped = 1 THEN CAST(cap AS DOUBLE)
        |                  ELSE round(CAST(budget - capsum AS DOUBLE) / (n_src - t), 6)
        |             END / n_tokens, 6) AS epochs
        |FROM h CROSS JOIN s ORDER BY source""".stripMargin,
    "q213_mixture_materialize" ->
      """WITH t AS (SELECT source, CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n,
        |             md5(CAST(doc_id AS VARCHAR) || ':mix') AS ok FROM documents),
        |st AS (SELECT source, CAST(round(pow(CAST(sum(n) AS DOUBLE), 0.7), 6) AS DECIMAL(28,6)) AS wt
        |       FROM t GROUP BY 1),
        |tw AS (SELECT sum(wt) AS tot_w FROM st),
        |tg AS (SELECT source,
        |         CAST(floor(round(CAST(wt AS DOUBLE) / CAST(tot_w AS DOUBLE), 6) * 10000) AS BIGINT) AS target_tokens
        |       FROM st CROSS JOIN tw),
        |r AS (SELECT t.source, n,
        |        sum(n) OVER (PARTITION BY t.source ORDER BY ok
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS pre,
        |        target_tokens
        |      FROM t JOIN tg USING (source))
        |SELECT source, count(*) AS n_docs_total,
        |       CAST(sum(CASE WHEN pre < target_tokens THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
        |       CAST(sum(CASE WHEN pre < target_tokens THEN n ELSE 0 END) AS BIGINT) AS tokens_admitted,
        |       target_tokens,
        |       CASE WHEN target_tokens = 0 THEN NULL
        |            ELSE round(CAST(sum(CASE WHEN pre < target_tokens THEN n ELSE 0 END) AS DOUBLE) / target_tokens, 6)
        |       END AS realized_ratio
        |FROM r GROUP BY source, target_tokens ORDER BY source""".stripMargin,
    "q210_packing_curve" ->
      """WITH sz AS (SELECT CAST(unnest([32, 64, 128, 256]) AS BIGINT) AS context),
        |t AS (SELECT lang, CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n FROM documents),
        |pl AS (SELECT context, lang, count(*) AS n_docs,
        |         CAST(sum(CASE WHEN n > context THEN 1 ELSE 0 END) AS BIGINT) AS n_trunc,
        |         CAST(sum(n) AS BIGINT) AS total,
        |         CAST(sum(least(n, context)) AS BIGINT) AS kept
        |       FROM t CROSS JOIN sz GROUP BY 1, 2),
        |pls AS (SELECT *, (kept + context - 1) // context AS seqs FROM pl)
        |SELECT context, CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |       CAST(sum(n_trunc) AS BIGINT) AS n_docs_trunc,
        |       CAST(sum(total) AS BIGINT) AS tokens_total,
        |       CAST(sum(kept) AS BIGINT) AS tokens_kept,
        |       CAST(sum(n_docs * context - kept) AS BIGINT) AS pad_unpacked,
        |       CAST(sum(seqs) AS BIGINT) AS seqs_packed,
        |       round(CAST(sum(kept) AS DOUBLE) / (sum(n_docs) * context), 6) AS eff_unpacked,
        |       round(CAST(sum(kept) AS DOUBLE) / (sum(seqs) * context), 6) AS eff_packed
        |FROM pls GROUP BY context ORDER BY context""".stripMargin,
    "q168_padding_waste" ->
      """WITH t AS (SELECT CAST(length(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
        |           FROM documents),
        |b AS (SELECT n_tokens,
        |        CASE WHEN n_tokens <= 16 THEN 16 WHEN n_tokens <= 32 THEN 32
        |             WHEN n_tokens <= 48 THEN 48 WHEN n_tokens <= 64 THEN 64
        |             ELSE 96 END AS bucket,
        |        CASE WHEN n_tokens > 96 THEN n_tokens - 96 ELSE 0 END AS truncated
        |      FROM t)
        |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |       CAST(sum(bucket - least(n_tokens, bucket)) AS BIGINT) AS total_padding,
        |       CAST(sum(truncated) AS BIGINT) AS tokens_truncated,
        |       round(CAST(sum(bucket - least(n_tokens, bucket)) AS DOUBLE)
        |             / sum(bucket), 6) AS pad_ratio
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q63_hash_sample" ->
      """WITH u AS (SELECT doc_id, lang,
        |  CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |       AS DOUBLE) / 4294967296.0 AS uu
        |  FROM documents)
        |SELECT doc_id, lang, round(uu, 6) AS u FROM u
        |WHERE uu < CASE lang WHEN 'en' THEN 0.9 WHEN 'de' THEN 0.5 WHEN 'fr' THEN 0.5
        |                     ELSE 0.25 END
        |ORDER BY doc_id""".stripMargin,
    "q118_weighted_sample" ->
      """WITH u AS (SELECT doc_id, source, n_chars,
        |  CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |       AS DOUBLE) / 4294967296.0 AS uu
        |  FROM documents)
        |SELECT doc_id, source, n_chars,
        |       round(-ln(uu + 1e-12) / n_chars, 9) AS k
        |FROM u ORDER BY k, doc_id LIMIT 50""".stripMargin,
    "q111_stratum_topn" ->
      """WITH u AS (SELECT source, doc_id,
        |  CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |       AS DOUBLE) / 4294967296.0 AS uu
        |  FROM documents),
        |r AS (SELECT source, doc_id, uu,
        |        row_number() OVER (PARTITION BY source ORDER BY uu, doc_id) AS rn
        |      FROM u)
        |SELECT source, rn, doc_id, round(uu, 6) AS u FROM r
        |WHERE rn <= 40 ORDER BY source, rn""".stripMargin,
    "q101_temperature_mix" ->
      """WITH t AS (SELECT source, count(*) AS n_docs,
        |             CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
        |           FROM documents GROUP BY source),
        |w AS (SELECT source, n_docs, n_tokens,
        |        CAST(round(pow(CAST(n_tokens AS DOUBLE), 0.7), 6) AS DECIMAL(28,6)) AS wt
        |      FROM t),
        |tots AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens, sum(wt) AS tot_w FROM w)
        |SELECT source, n_docs, n_tokens,
        |       round(CAST(n_tokens AS DOUBLE) / tot_tokens, 6) AS raw_share,
        |       round(CAST(wt AS DOUBLE) / CAST(tot_w AS DOUBLE), 6) AS temp_share
        |FROM w CROSS JOIN tots ORDER BY source""".stripMargin,
    "q64_mixture_rates" ->
      """SELECT lang, count(*) AS n_docs,
        |       round(CAST(min(count(*)) OVER () AS DOUBLE) / count(*), 6) AS rate
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q65_pack_chunks" ->
      """WITH t AS (SELECT doc_id, lang, len(string_split(trim(text), ' ')) AS n FROM documents),
        |r AS (SELECT doc_id, lang, n,
        |        sum(n) OVER (PARTITION BY lang ORDER BY doc_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |      FROM t)
        |SELECT lang, CAST(floor(CAST(running - n AS DOUBLE) / 512.0) AS BIGINT) AS chunk_id,
        |       count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS chunk_tokens
        |FROM r GROUP BY 1, 2 ORDER BY lang, chunk_id""".stripMargin,
    "q68_split_assign" ->
      """SELECT lang, split, count(*) AS n_docs FROM (
        |  SELECT lang, CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |                    ELSE 'test' END AS split
        |  FROM (SELECT lang,
        |          CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 4)) AS BIGINT) % 100 AS b
        |        FROM documents))
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q70_training_order" ->
      """WITH k AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS ok,
        |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 8 AS shard
        |  FROM documents)
        |SELECT shard, row_number() OVER (PARTITION BY shard ORDER BY ok, doc_id) AS pos,
        |       doc_id, lang
        |FROM k ORDER BY shard, pos""".stripMargin,
    "q83_chunk_overlap" ->
      """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |spans AS (SELECT doc_id, w,
        |                 CASE WHEN len(w) <= 64 THEN 0
        |                      ELSE CAST(ceil(CAST(len(w) - 64 AS DOUBLE) / 48) AS INT) END AS last_j
        |          FROM toks),
        |chunks AS (SELECT doc_id, CAST(j AS BIGINT) AS chunk_id,
        |                  list_slice(w, j * 48 + 1, j * 48 + 64) AS c
        |           FROM spans, unnest(range(0, last_j + 1)) AS t(j))
        |SELECT doc_id, chunk_id, CAST(len(c) AS BIGINT) AS n_tokens,
        |       array_to_string(c, ' ') AS chunk_text
        |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin,

    "q203_export_manifest" ->
      """WITH d AS (
        |  SELECT CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 8 AS shard,
        |         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS toks,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS bytes,
        |         CAST(concat('0x', substring(md5(text), 1, 8)) AS BIGINT) AS fp
        |  FROM documents)
        |SELECT shard, count(*) AS n_docs,
        |       CAST(sum(toks) AS BIGINT) AS n_tokens,
        |       CAST(sum(bytes) AS BIGINT) AS n_bytes,
        |       bit_xor(fp) AS content_fp
        |FROM d GROUP BY shard ORDER BY shard""".stripMargin
  )
}
