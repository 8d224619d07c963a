package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Corpus governance operators over the `documents` table — the scrub /
  * filter / stratify stages that run between raw ingest and training:
  *
  *  1. pattern scrubbing (q66) — redact every match of a sensitive-term
  *     regex and count the hits per document. On a real corpus the pattern
  *     set is PII-shaped (emails, phone numbers, ID formats); the fixture
  *     vocabulary has no PII, so the registered query scrubs a stand-in
  *     term with the identical machinery (`regexp_replace` + `regexp_count`,
  *     both codegen'd). The output carries md5(scrubbed text) rather than
  *     the scrubbed text itself so the oracle verifies the replacement
  *     byte-for-byte without shipping full documents through the compare;
  *  2. intra-document repetition metrics (q67) — type-token ratio and the
  *     top single-token frequency share, the standard signals for dropping
  *     degenerate/boilerplate documents (low TTR = the document repeats
  *     itself). Entirely row-local: the token array is let-bound once per
  *     row (a 1-element `transform`, so the split cannot be inlined into
  *     each lambda use) and every metric derives from that bound variable;
  *  3. benchmark decontamination (q72) — flag training documents whose
  *     5-gram shingles overlap a held-out evaluation set (here: the
  *     `doc_id % 97 == 0` slice standing in for a benchmark corpus), the
  *     standard eval-leakage scan. The eval shingle set is tiny relative to
  *     the corpus, so the overlap check is a broadcast semi-join against
  *     the exploded training shingles — the corpus is never shuffled on
  *     shingle, and shingling reuses [[Dedup.shingles5]] (let-bound, one
  *     split per row);
  *  4. unigram LM scoring (q73) — per-document mean log10 probability under
  *     the corpus's own unigram distribution, the CCNet-shaped fluency /
  *     outlier signal. Two passes: token counts (map-side combined), then a
  *     broadcast rejoin of the frequency table so the exploded tokens never
  *     shuffle — each document's tokens stay in their scan partition, which
  *     also makes the per-document float sum order deterministic. (At a
  *     100 TB vocabulary the frequency side graduates from broadcast to a
  *     shuffled join with decimal-space recombination — the salted-agg
  *     escape hatch already in [[Skew]]);
  *  5. winnowing fingerprints (q74/q75) — the Schleimer–Wilkerson–Aiken
  *     local-minima fingerprint scheme (MOSS; the substring-level dedup
  *     signal of Lee et al.'s "Deduplicating Training Data"): hash every
  *     token 5-gram, slide a w=4 window over the hash sequence, keep each
  *     window's minimum. Any shared token run of ≥ k+w−1 = 8 tokens is
  *     GUARANTEED to surface a shared fingerprint (asserted on a planted
  *     pair in the spec) at ~2/(w+1) the density of full shingling. q74 is
  *     pure row-local map work over let-bound arrays; q75 turns shared
  *     fingerprints into candidate pairs with the same df-capped
  *     posting-list equi-join as the q35 Jaccard tier — pair generation
  *     streams through a join, never a collect_list buffer, and no
  *     all-pairs join exists at any scale;
  *  6. interpolated bigram LM scoring (q98) — per-document mean log10
  *     probability under a Jelinek–Mercer-interpolated bigram model
  *     (0.7·P(w2|w1) + 0.3·P(w2)) estimated from the corpus's own counts —
  *     the next rung above q73's unigram fluency signal: it scores word
  *     ORDER, so shuffled/boilerplate-stitched text that fools a unigram
  *     model still scores low. Same scale layout as q73: count tables are
  *     broadcast back onto the exploded bigrams, so each document's bigrams
  *     never leave their scan partition (order-deterministic float sums);
  *     at a 100 TB vocabulary the count joins graduate to shuffled
  *     equi-joins keyed on the bigram — the exploded side is narrow
  *     (doc_id + two tokens) and hash-spread by construction;
  *  7. DSIR importance weights (q100) — Xie et al., "Data Selection for
  *     Language Models via Importance Resampling" (2023): hashed-unigram
  *     bucket counts estimate a target-slice distribution vs the raw-corpus
  *     distribution (add-1 smoothing over [[DsirBuckets]] buckets), and each
  *     document scores Σ log10(p_target(b)/p_raw(b)) over its tokens — the
  *     importance weight that resamples raw data toward a quality target.
  *     The bucket-count aggregations map-side-combine to <= 256 rows per
  *     partition; totals derive from the tiny count tables (NO extra corpus
  *     pass); the 256-row log-ratio table broadcasts back onto the token
  *     stream. Log-ratios are pre-rounded at 9 decimals so the per-document
  *     sum is a sum of identical addends on any engine;
  *  8. curriculum bucketing (q71) — quartile documents by quality score
  *     ([[TextAnalytics.qualityScore]]) using exact percentile thresholds.
  *     Two passes: a tiny 1-row threshold aggregate, broadcast back, then a
  *     row-local bucket assignment + per-bucket stats. Never a global-order
  *     window: `ntile` over an unpartitioned window would serialize the
  *     corpus through one task, while the threshold form keeps both passes
  *     fully parallel (the published design for quantile bucketing at
  *     scale).
  *
  * Scale design: q66 and q67 are pure per-row map work followed only by the
  * presentation sort; q71's wide operations are one scalar aggregate and one
  * |buckets|-row group-by. No shuffle ever carries document text.
  */
object Scrub extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.read(s, dir, "documents")

  /** Stand-in sensitive-term pattern (see scaladoc: fixture text has no real
    * PII; the machinery is pattern-agnostic). */
  val ScrubPattern = "\\bcustomer\\b"
  val ScrubReplacement = "[REDACTED]"

  /** Hashed-feature space size for the DSIR importance weights (q100).
    * 256 on the fixture vocabulary; DSIR's published configuration is 10k
    * buckets over unigram+bigram features — the knob is a parameter and the
    * layout (map-side-combined bucket counts + a broadcast log-ratio table)
    * is bucket-count-independent. */
  val DsirBuckets = 256

  /** Winnowed fingerprints of `text` as `struct(n_grams, fps)`: hash every
    * token 5-gram (first 8 md5 hex chars as a BIGINT — replayable by the
    * oracle), slide a w=4 window, keep each window's minimum, distinct the
    * survivors. Both the token array and the hash sequence are let-bound
    * lambda variables (1-element `transform`s), so the split and the gram
    * hashing each run exactly once per row. Callers must pre-filter to
    * >= 8 tokens (one full window); `sequence` on a shorter doc would run
    * backwards. */
  private val winnowed: Column =
    element_at(transform(array(split(trim(col("text")), " ")), w => {
      val hashes = transform(sequence(lit(1), size(w) - 4), i =>
        conv(substring(md5(array_join(slice(w, i, lit(5)), " ")), 1, 8), 16, 10).cast("long"))
      element_at(transform(array(hashes), h =>
        struct(size(h).cast(LongType).as("n_grams"),
          array_distinct(transform(sequence(lit(1), size(h) - 3), j =>
            array_min(slice(h, j, lit(4))))).as("fps"))), 1)
    }), 1)

  /** The winnowed fingerprint SET of `text` (spec hook for the detection
    * guarantee; same >= 8-token domain requirement as [[winnowed]]). */
  def winnowedFps: Column = winnowed.getField("fps")

  /** [[winnowed]] with a parametric window size (q289's sensitivity
    * sweep); callers must pre-filter to >= 4 + w tokens. */
  private def winnowedWith(wWin: Int): Column =
    element_at(transform(array(split(trim(col("text")), " ")), w => {
      val hashes = transform(sequence(lit(1), size(w) - 4), i =>
        conv(substring(md5(array_join(slice(w, i, lit(5)), " ")), 1, 8), 16, 10).cast("long"))
      element_at(transform(array(hashes), h =>
        struct(size(h).cast(LongType).as("n_grams"),
          array_distinct(transform(sequence(lit(1), size(h) - (wWin - 1)), j =>
            array_min(slice(h, j, lit(wWin))))).as("fps"))), 1)
    }), 1)

  /** Session-materialized winnow frame `(doc_id, fp struct(n_grams, fps))`
    * over the >= 8-token documents — the per-doc fingerprint SILVER TABLE
    * both q74 (summary) and q75 (pair candidates) derive from. The winnow
    * kernel is an interpreted higher-order fold (md5 per 5-gram), the most
    * expensive row-local text op in the module — computing it once per
    * (session, dir) is exactly what a production pipeline does by
    * persisting fingerprints next to the corpus. Same lifecycle/bypass
    * contract as the other silver layers (`-Dgraft.noEdgeCache=1`). */
  private val winnowCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  def sharedWinnowed(s: SparkSession, dir: String): DataFrame = {
    def fresh = docs(s, dir)
      .filter(TextAnalytics.nTokens(col("text")) >= 8)
      .select(col("doc_id"), winnowed.as("fp"))
    if (sys.props.get("graft.noEdgeCache").contains("1")) return fresh
    if (winnowCache.size > 4) winnowCache.clear()
    winnowCache.computeIfAbsent((s.sparkContext.applicationId, dir), _ => fresh.localCheckpoint())
  }

  /** Gopher-style duplicate-n-gram coverage (q103) — Rae et al., "Scaling
    * Language Models: ... Gopher" (2021) Table A1: the fraction of a
    * document covered by token 3-grams that repeat WITHIN the document, the
    * repetition filter that catches looping/boilerplate text q67's
    * type-token ratio under-weights (a doc can have high TTR overall yet
    * one pathologically repeated phrase). Positions covered by any
    * occurrence of a duplicated gram count ONCE (interval union via
    * countDistinct), so the score is a true fraction in [0, 1].
    *
    * Scale shape: one explode, one (doc_id, gram)-keyed window to flag
    * duplicated grams (hash-spread by construction), a 3-position explode of
    * the flagged rows only, and a per-doc countDistinct — all linear in
    * corpus tokens; no row-local O(n²) gram matching. */
  def dupNgramFracFrom(d: DataFrame): DataFrame = {
    val grams = element_at(transform(array(split(trim(col("text")), " ")), w =>
      transform(sequence(lit(1), size(w) - 2), i =>
        array_join(slice(w, i, lit(3)), " "))), 1)
    val base = d.filter(TextAnalytics.nTokens(col("text")) >= 3)
      .select(col("doc_id"), TextAnalytics.nTokens(col("text")).as("n_tokens"))
    val g = d.filter(TextAnalytics.nTokens(col("text")) >= 3)
      .select(col("doc_id"), posexplode(grams).as(Seq("pos0", "gram")))
      .select(col("doc_id"), (col("pos0") + 1).as("i"), col("gram"))
    val byGram = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("gram"))
    val cov = g.withColumn("c", count(lit(1)).over(byGram))
      .filter(col("c") >= 2)
      .select(col("doc_id"), explode(array(col("i"), col("i") + 1, col("i") + 2)).as("p"))
      .groupBy(col("doc_id")).agg(countDistinct(col("p")).as("covered"))
    base.join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("covered"), lit(0L)).as("covered"),
        round(coalesce(col("covered"), lit(0L)).cast("double") / col("n_tokens"), 6)
          .as("dup_gram_frac"))
      .orderBy(col("doc_id"))
  }

  /** Interpolated bigram LM scores from a `(doc_id, text)` frame (scaladoc
    * item 6): `(doc_id, n_bigrams, avg_logprob)` over docs with >= 2 tokens;
    * count tables estimated from the frame itself. */
  def bigramLogprobFrom(d: DataFrame): DataFrame = {
    val toks = d.select(col("doc_id"), explode(split(trim(col("text")), " ")).as("tok"))
    val uc = toks.groupBy(col("tok")).agg(count(lit(1)).as("cu"))
    // Total token count folds out of the (vocabulary-sized) unigram table —
    // summing `cu` equals counting `toks` rows, without a second corpus
    // explode. Same trick below for c1: at 100 TB a corpus scan is the unit
    // of cost and this function's only irreducible scans are the two
    // explodes (unigram counts + the scoring pass over bigrams) plus the
    // bigram-count pass — everything else is arithmetic on bounded tables.
    val tot = uc.agg(sum(col("cu")).as("n"))
    // Bigram structs are built row-locally from a let-bound token array
    // (one split per document), then exploded once.
    val bigrams = element_at(transform(array(split(trim(col("text")), " ")), w =>
      transform(sequence(lit(1), size(w) - 1), i =>
        struct(element_at(w, i).as("w1"), element_at(w, i + 1).as("w2")))), 1)
    val bg = d.filter(TextAnalytics.nTokens(col("text")) >= 2)
      .select(col("doc_id"), explode(bigrams).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // c1(w1) = Σ_w2 c12(w1,w2), computed as a WINDOW over the aggregated
    // bigram-count table rather than a separate groupBy: a groupBy lineage
    // keys on w1 where bc's exchange keys on (w1, w2), so Catalyst cannot
    // reuse the exchange and re-explodes the corpus for it (measured: a
    // 4th FileScan). The window runs on the bounded vocab-sized table and
    // rides into the same broadcast — the plan holds exactly 3 corpus
    // scans (spec-pinned in ScrubSpec).
    val bcw = org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))
    val bc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .withColumn("c1", sum(col("c12")).over(bcw))
    bg.join(broadcast(bc), Seq("w1", "w2"))
      .join(broadcast(uc.withColumnRenamed("tok", "w2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log10(lit(0.7) * col("c12").cast("double") / col("c1") +
          lit(0.3) * col("cu").cast("double") / col("n"))), 6).as("avg_logprob"))
      .orderBy(col("doc_id"))
  }

  /** DSIR hashed-unigram importance weights from a `(doc_id, text)` frame
    * (scaladoc item 7): `(doc_id, n_tokens, importance)` where the target
    * distribution is estimated from rows matching `targetPred`. */
  def dsirWeightsFrom(d: DataFrame, targetPred: Column): DataFrame = {
    val s = d.sparkSession
    val bt = d
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("tok"))
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast(LongType) % DsirBuckets).as("b"))
    val tc = bt.filter(targetPred).groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val rc = bt.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    // Totals fall out of the (tiny) bucket-count tables — no extra corpus pass.
    val nt = tc.agg(sum(col("ct")).as("n_t"))
    val nr = rc.agg(sum(col("cr")).as("n_r"))
    val grid = s.range(DsirBuckets).select(col("id").as("b"))
    val lr = grid.join(tc, Seq("b"), "left").join(rc, Seq("b"), "left")
      .crossJoin(nt).crossJoin(nr)
      .select(col("b"),
        round(log10(
          ((coalesce(col("ct"), lit(0L)) + 1).cast("double") / (col("n_t") + DsirBuckets)) /
          ((coalesce(col("cr"), lit(0L)) + 1).cast("double") / (col("n_r") + DsirBuckets))), 9)
          .as("logratio"))
    // The 9-dp-rounded log-ratios sum in DECIMAL space: the sum is then
    // exact and order-independent, so the final 6-dp round cannot straddle
    // a half-up boundary differently per engine (a raw double sum did).
    bt.join(broadcast(lr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("logratio").cast("decimal(18,9)")), 6).cast("double").as("importance"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Boilerplate-opener census (q227): per source, the most repeated
    // 5-token document OPENERS — the navigation headers / cookie banners /
    // template preambles that dominate crawled sources (RefinedWeb and
    // CCNet both strip them line-wise; this is the detection pass that
    // decides WHAT to strip, per source). An opener carried by a large
    // share of one source's documents is template, not content — and
    // because it sits at position 0 it also poisons prefix-sensitive
    // tooling (winnowing anchors, packing boundaries). Top-3 per source by
    // (count desc, opener asc); share = n_docs / source size. One grouped
    // count over (source, opener) + a source-partitioned rank window.
    "q227_boilerplate_openers" -> ((s, dir) => {
      val opener = array_join(slice(split(trim(col("text")), " "), 1, 5), " ")
      val d = docs(s, dir)
        .filter(TextAnalytics.nTokens(col("text")) >= 5)
        .select(col("source"), opener.as("opener"))
      val srcTot = d.groupBy(col("source")).agg(count(lit(1)).as("src_docs"))
      val cnt = d.groupBy(col("source"), col("opener")).agg(count(lit(1)).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
        .orderBy(col("n_docs").desc, col("opener"))
      cnt.withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= 3)
        .join(srcTot, Seq("source"))
        .select(col("source"), col("rk"), col("opener"), col("n_docs"),
          round(col("n_docs").cast("double") / col("src_docs"), 6).as("share"))
        .orderBy(col("source"), col("rk"))
    }),

    "q66_pattern_scrub" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        regexp_count(col("text"), lit(ScrubPattern)).cast(LongType).as("n_hits"),
        md5(regexp_replace(col("text"), ScrubPattern, ScrubReplacement)).as("scrubbed_md5"))
        .orderBy(col("doc_id"))),

    "q67_repetition_metrics" -> ((s, dir) => {
      // Let-bind the token array once per row: `w` is a lambda variable, so
      // unlike a projected alias it cannot be inlined (re-split) per use.
      val metrics = element_at(
        transform(array(split(trim(col("text")), " ")), w => {
          val n = size(w).cast("double")
          val dn = size(array_distinct(w)).cast("double")
          val topf = array_max(
            transform(array_distinct(w), t => size(filter(w, x => x === t)))).cast("double")
          struct(
            size(w).cast(LongType).as("n_tokens"),
            size(array_distinct(w)).cast(LongType).as("n_distinct"),
            round(dn / n, 6).as("ttr"),
            round(topf / n, 6).as("top_tok_ratio"))
        }), 1)
      docs(s, dir)
        .select(col("doc_id"), metrics.as("m"))
        .select(col("doc_id"), col("m.n_tokens"), col("m.n_distinct"),
          col("m.ttr"), col("m.top_tok_ratio"))
        .orderBy(col("doc_id"))
    }),

    // Eval-leakage scan: contamination(doc) = |shingles(doc) ∩ eval shingles|
    // / |shingles(doc)| over the training slice. Docs with < 5 tokens have
    // no shingles and are out of scope (same domain as q35).
    // Decontamination n-gram-size curve (q287): the contamination RATE of
    // the training split against the eval slice at n ∈ {3, 5, 8} — the
    // tuning table behind q72's fixed-n report (GPT-3 used 13-grams, PaLM
    // 8-grams; too-short n flags common phrases, too-long n misses real
    // leaks — this curve is how the cutoff is actually chosen). Per n:
    // eval-side distinct n-grams broadcast against one training-side pass
    // (the q72 marker-join layout); denominator = train docs long enough
    // to carry an n-gram. The tokenized frame is materialized once for
    // all three legs.
    "q287_decontam_ngram_curve" -> ((s, dir) => {
      val w = docs(s, dir)
        .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
        .localCheckpoint()
      def shingled(n: Int): DataFrame =
        w.filter(size(col("w")) >= n)
          .select(col("doc_id"), explode(expr(
            s"transform(sequence(0, size(w) - $n), i -> concat_ws(' ', slice(w, i + 1, $n)))"))
            .as("s"))
      val legs = Seq(3, 5, 8).map { n =>
        val sh = shingled(n)
        val ev = sh.filter(col("doc_id") % 97 === 0).select(col("s")).distinct()
        sh.filter(col("doc_id") % 97 =!= 0)
          .join(broadcast(ev.withColumn("hit", lit(1))), Seq("s"), "left")
          .groupBy(col("doc_id"))
          .agg(max(col("hit")).as("hit"))
          .agg(lit(n.toLong).as("ngram_n"), count(lit(1)).as("n_train_docs"),
            coalesce(sum(col("hit")), lit(0)).cast("long").as("n_contaminated"))
          .select(col("ngram_n"), col("n_train_docs"), col("n_contaminated"),
            round(col("n_contaminated").cast("double") / col("n_train_docs"), 6)
              .as("contamination_rate"))
      }
      legs.reduce(_ unionByName _).orderBy(col("ngram_n"))
    }),

    "q72_decontamination" -> ((s, dir) => {
      val sh = Dedup.shingledFrom(docs(s, dir))
      val ev = sh.filter(col("doc_id") % 97 === 0)
        .select(explode(col("shingles")).as("s")).distinct()
      val tr = sh.filter(col("doc_id") % 97 =!= 0)
      // ONE pass over the training side: a marker-column broadcast left join
      // scores each exploded shingle in place, so n_shingles (count) and
      // n_hit (count of markers) fall out of the same aggregation — no
      // second corpus scan for sizes, no rejoin of the counts.
      tr.select(col("doc_id"), explode(col("shingles")).as("s"))
        .join(broadcast(ev.withColumn("hit", lit(1))), Seq("s"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hit"))
        .select(col("doc_id"), col("n_shingles"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n_shingles"), 6).as("contamination"))
        .orderBy(col("doc_id"))
    }),

    // Unigram LM score: mean log10 token probability under the corpus's own
    // unigram counts (see scaladoc for the broadcast-vs-shuffle scale note).
    "q73_unigram_logprob" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("tok"))
      val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val tot = freq.agg(sum(col("cnt")).as("total"))
      toks.join(broadcast(freq), Seq("tok"))
        .crossJoin(broadcast(tot))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(log10(col("cnt").cast("double") / col("total"))), 6).as("avg_logprob"))
        .orderBy(col("doc_id"))
    }),

    // Winnowing window-size sensitivity (q289): corpus fingerprint count
    // and measured density at w ∈ {4, 8, 16} against the theoretical
    // expected density 2/(w+1) (Schleimer et al. 2003) — the storage-vs-
    // guarantee tuning curve (larger w: fewer fingerprints, but matches
    // shorter than k+w−1 grams can be missed). Each leg is one row-local
    // winnow pass (no shuffle beyond the final 1-row aggregates); the
    // measured/expected ratio near 1 is the sanity check that the min-
    // sampling isn't biased by the hash.
    "q289_winnow_w_curve" -> ((s, dir) => {
      val legs = Seq(4, 8, 16).map { wWin =>
        val fp = docs(s, dir)
          .filter(size(split(trim(col("text")), " ")) >= 4 + wWin)
          .select(winnowedWith(wWin).as("fp"))
          .select(col("fp.n_grams").as("n_grams"),
            size(col("fp.fps")).cast(LongType).as("n_fps"))
        fp.agg(lit(wWin.toLong).as("w"), count(lit(1)).as("n_docs"),
            sum(col("n_grams")).as("n_grams_total"),
            sum(col("n_fps")).as("n_fingerprints"),
            round(sum(col("n_fps")).cast("double")
              / sum(col("n_grams") - lit(wWin - 1)).cast("double"), 6).as("density"))
          .select(col("w"), col("n_docs"), col("n_grams_total"), col("n_fingerprints"),
            col("density"),
            round(lit(2.0) / (lit(wWin) + lit(1.0)), 6).as("expected_density"),
            round(col("density") / (lit(2.0) / (lit(wWin) + lit(1.0))), 6).as("ratio"))
      }
      legs.reduce(_ unionByName _).orderBy(col("w"))
    }),

    // Winnowed fingerprint summary per document (see scaladoc item 5).
    // Domain: docs with >= 8 tokens (k+w-1), the minimum for one window.
    "q74_winnow_fingerprints" -> ((s, dir) =>
      sharedWinnowed(s, dir)
        .select(col("doc_id"), col("fp.n_grams"),
          size(col("fp.fps")).cast(LongType).as("n_fingerprints"),
          round(size(col("fp.fps")).cast("double") /
            (col("fp.n_grams") - lit(3)).cast("double"), 6).as("density"))
        .orderBy(col("doc_id"))),

    // Substring-level near-dup candidates: docs sharing >= 2 winnowed
    // fingerprints. Same scale layout as q35: explode once, one shuffle on
    // the fingerprint into df-capped posting lists, then ordered pairs
    // STREAM out of each list (explode + suffix-filter explode — per-row
    // memory bounded by the list, never the pair array), aggregate the
    // shared count. Cost is Σ df², never n²; no self-join, no second
    // shuffle of the exploded table.
    "q75_winnow_pairs" -> ((s, dir) => {
      val fps = sharedWinnowed(s, dir)
        .select(col("doc_id"), explode(col("fp.fps")).as("f"))
      val postings = fps.groupBy(col("f"))
        .agg(collect_list(col("doc_id")).as("ds"))
        .filter(size(col("ds")).between(2, 1024))
      postings
        .select(col("ds"), explode(col("ds")).as("id_a"))
        .select(col("id_a"), explode(expr("filter(ds, y -> y > id_a)")).as("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .orderBy(col("n_shared").desc, col("id_a"), col("id_b"))
    }),

    // Interpolated bigram LM score (see scaladoc item 6). Domain: docs with
    // >= 2 tokens (one bigram); unigram stats come from the full corpus.
    "q98_bigram_logprob" -> ((s, dir) => bigramLogprobFrom(docs(s, dir))),

    // Gopher duplicate-3-gram coverage (see [[dupNgramFracFrom]]).
    "q103_dup_ngram_frac" -> ((s, dir) => dupNgramFracFrom(docs(s, dir))),

    // DSIR hashed-unigram importance weights (see scaladoc item 7). The
    // fixture's "target domain" is the doc_id % 7 == 0 slice (the same
    // stand-in device as q72's eval slice).
    "q100_dsir_weights" -> ((s, dir) =>
      dsirWeightsFrom(docs(s, dir), col("doc_id") % 7 === 0)),

    // DSIR effective sample size (q282): per source, ESS = (Σw)²/Σw² of
    // the q100 importance weights (w = 10^importance) — the number that
    // says whether importance-resampling a source actually has that many
    // effective documents behind it, or whether a few huge weights carry
    // everything (ESS/n near 1 = uniform, near 1/n = one doc dominates —
    // resampling that source is noise, cap the weights first). One join
    // of the q100 frame to source metadata, decimal-summed squares.
    "q282_dsir_ess" -> ((s, dir) => {
      val dec = DecimalType(38, 12)
      val w = dsirWeightsFrom(docs(s, dir), col("doc_id") % 7 === 0)
        .select(col("doc_id"), round(pow(lit(10.0), col("importance")), 6).as("w"))
      val src = docs(s, dir).select(col("doc_id"), col("source"))
      w.join(src, "doc_id").groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("w").cast(DecimalType(18, 6))).cast("double").as("sum_w"),
          sum(round(col("w") * col("w"), 12).cast(dec)).cast("double").as("sum_w2"))
        .select(col("source"), col("n_docs"), round(col("sum_w"), 6).as("sum_w"),
          round(col("sum_w") * col("sum_w") / col("sum_w2"), 6).as("ess"),
          round(col("sum_w") * col("sum_w") / col("sum_w2") / col("n_docs"), 6)
            .as("ess_ratio"))
        .orderBy(col("source"))
    }),

    // Length-quartile × quality confounder matrix (q249): the audit run
    // BEFORE trusting the q31 quality gate — the score's 0.5·min(1,
    // chars/500) term mechanically rewards length, so a "quality" filter
    // can silently become a LENGTH filter (the known C4-style bias toward
    // long prose). Documents bucket by exact token-count quartiles (the
    // q71 broadcast-threshold layout — never an unpartitioned ntile), and
    // each bucket reports mean quality plus the >= 0.5 gate's pass rate.
    // A pass rate marching monotonically with the length bucket is the
    // confounder made visible; mixture planners then stratify on length
    // (q65/q210) instead of letting the gate skew the corpus long. One
    // row-local scoring pass, one 1-row percentile aggregate broadcast
    // back, one 4-row rollup.
    "q249_length_quality" -> ((s, dir) => {
      val scored = docs(s, dir).select(col("doc_id"),
        TextAnalytics.nTokens(col("text")).cast("double").as("len"),
        TextAnalytics.qualityScore.as("q"))
      val th = scored.agg(
        expr("percentile(len, 0.25)").as("p25"),
        expr("percentile(len, 0.50)").as("p50"),
        expr("percentile(len, 0.75)").as("p75"))
      scored.crossJoin(broadcast(th))
        .withColumn("len_bucket",
          when(col("len") <= col("p25"), lit(1L))
            .when(col("len") <= col("p50"), lit(2L))
            .when(col("len") <= col("p75"), lit(3L))
            .otherwise(lit(4L)))
        .groupBy(col("len_bucket"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("len")).cast("long").cast("double") / count(lit(1)), 6)
            .as("avg_len"),
          round(sum(col("q").cast(DecimalType(18, 6))).cast("double")
            / count(lit(1)), 6).as("avg_quality"),
          sum(when(col("q") >= 0.5, 1L).otherwise(0L)).as("n_pass"))
        .select(col("len_bucket"), col("n_docs"), col("avg_len"),
          col("avg_quality"), col("n_pass"),
          round(col("n_pass").cast("double") / col("n_docs"), 6).as("pass_rate"))
        .orderBy(col("len_bucket"))
    }),

    "q71_curriculum_buckets" -> ((s, dir) => {
      val scored = docs(s, dir)
        .select(col("doc_id"), TextAnalytics.qualityScore.as("score"))
      // Exact quartile thresholds: one 1-row aggregate, broadcast back.
      // `percentile` (exact, interpolated) matches DuckDB's percentile_cont:
      // when the rank lands between two order statistics both engines return
      // a strict convex combination, so no score can sit exactly on a
      // threshold unless the neighbors are equal — in which case both
      // engines return that value exactly. Bucket assignment is therefore
      // engine-independent despite the floating-point interpolation.
      val th = scored.agg(
        expr("percentile(score, 0.25)").as("p25"),
        expr("percentile(score, 0.50)").as("p50"),
        expr("percentile(score, 0.75)").as("p75"))
      scored.crossJoin(broadcast(th))
        .withColumn("bucket",
          when(col("score") <= col("p25"), lit(1))
            .when(col("score") <= col("p50"), lit(2))
            .when(col("score") <= col("p75"), lit(3))
            .otherwise(lit(4)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("score")), 6).as("avg_score"),
          min(col("score")).as("min_score"),
          max(col("score")).as("max_score"))
        .orderBy(col("bucket"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q227_boilerplate_openers" ->
      """WITH d AS (SELECT source,
        |             array_to_string(string_split(trim(text), ' ')[1:5], ' ') AS opener
        |           FROM documents WHERE len(string_split(trim(text), ' ')) >= 5),
        |tot AS (SELECT source, count(*) AS src_docs FROM d GROUP BY 1),
        |cnt AS (SELECT source, opener, count(*) AS n_docs FROM d GROUP BY 1, 2),
        |rk AS (SELECT source, opener, n_docs,
        |         CAST(row_number() OVER (PARTITION BY source ORDER BY n_docs DESC, opener) AS BIGINT) AS rk
        |       FROM cnt)
        |SELECT rk.source, rk.rk, rk.opener, rk.n_docs,
        |       round(CAST(rk.n_docs AS DOUBLE) / tot.src_docs, 6) AS share
        |FROM rk JOIN tot ON tot.source = rk.source
        |WHERE rk.rk <= 3 ORDER BY rk.source, rk.rk""".stripMargin,
    "q66_pattern_scrub" ->
      """SELECT doc_id,
        |       len(regexp_extract_all(text, '\bcustomer\b')) AS n_hits,
        |       md5(regexp_replace(text, '\bcustomer\b', '[REDACTED]', 'g')) AS scrubbed_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q67_repetition_metrics" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
        |SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct,
        |       round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS ttr,
        |       round(CAST(list_max(list_transform(list_distinct(toks),
        |                 t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE) / len(toks), 6) AS top_tok_ratio
        |FROM t ORDER BY doc_id""".stripMargin,
    "q72_decontamination" ->
      """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(len(w) - 4),
        |         i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5])) AS shingles
        |       FROM toks WHERE len(w) >= 5),
        |ev AS (SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id, shingles FROM sh WHERE doc_id % 97 <> 0),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM tr),
        |hit AS (SELECT doc_id, count(*) AS n_hit FROM ex
        |        WHERE s IN (SELECT s FROM ev) GROUP BY 1)
        |SELECT t.doc_id, len(t.shingles) AS n_shingles,
        |       COALESCE(h.n_hit, 0) AS n_hit,
        |       round(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / len(t.shingles), 6) AS contamination
        |FROM tr t LEFT JOIN hit h ON h.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "q73_unigram_logprob" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
        |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |tot AS (SELECT count(*) AS total FROM toks)
        |SELECT doc_id, count(*) AS n_tokens,
        |       round(avg(log10(CAST(cnt AS DOUBLE) / total)), 6) AS avg_logprob
        |FROM toks JOIN freq USING (tok) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q289_winnow_w_curve" -> {
      val legs = Seq(4, 8, 16).map { w =>
        s"""f$w AS (SELECT len(h) AS n_grams,
           |          len(list_distinct(list_transform(range(len(h) - ${w - 1}),
           |                j -> list_min(h[j+1:j+$w])))) AS n_fps
           |        FROM g WHERE len(h) >= $w),
           |m$w AS (SELECT CAST($w AS BIGINT) AS w, count(*) AS n_docs,
           |          CAST(sum(n_grams) AS BIGINT) AS n_grams_total,
           |          CAST(sum(n_fps) AS BIGINT) AS n_fingerprints,
           |          round(CAST(sum(n_fps) AS DOUBLE)
           |                / CAST(sum(n_grams - ${w - 1}) AS DOUBLE), 6) AS density
           |        FROM f$w)""".stripMargin
      }.mkString(",\n")
      val tails = Seq(4, 8, 16).map(w =>
        s"SELECT w, n_docs, n_grams_total, n_fingerprints, density, " +
          s"round(2.0 / (${w} + 1.0), 6) AS expected_density, " +
          s"round(density / (2.0 / (${w} + 1.0)), 6) AS ratio FROM m$w").mkString(" UNION ALL ")
      s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
         |g AS MATERIALIZED (SELECT doc_id, list_transform(range(len(w) - 4), i ->
         |        CAST(concat('0x', substring(md5(w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5]), 1, 8)) AS BIGINT)) AS h
         |      FROM t WHERE len(w) >= 5),
         |$legs
         |SELECT * FROM ($tails) ORDER BY w""".stripMargin
    },
    "q74_winnow_fingerprints" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |g AS (SELECT doc_id, list_transform(range(len(w) - 4), i ->
        |        CAST(concat('0x', substring(md5(w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5]), 1, 8)) AS BIGINT)) AS h
        |      FROM t WHERE len(w) >= 8),
        |f AS (SELECT doc_id, len(h) AS n_grams,
        |        list_distinct(list_transform(range(len(h) - 3), j -> list_min(h[j+1:j+4]))) AS fps
        |      FROM g)
        |SELECT doc_id, n_grams, len(fps) AS n_fingerprints,
        |       round(CAST(len(fps) AS DOUBLE) / (n_grams - 3), 6) AS density
        |FROM f ORDER BY doc_id""".stripMargin,
    "q75_winnow_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |g AS (SELECT doc_id, list_transform(range(len(w) - 4), i ->
        |        CAST(concat('0x', substring(md5(w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5]), 1, 8)) AS BIGINT)) AS h
        |      FROM t WHERE len(w) >= 8),
        |f AS (SELECT doc_id,
        |        list_distinct(list_transform(range(len(h) - 3), j -> list_min(h[j+1:j+4]))) AS fps
        |      FROM g),
        |ex AS (SELECT doc_id, unnest(fps) AS f FROM f),
        |capped AS (SELECT f FROM ex GROUP BY f HAVING count(*) BETWEEN 2 AND 1024)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |FROM ex a JOIN ex b ON a.f = b.f AND a.doc_id < b.doc_id
        |WHERE a.f IN (SELECT f FROM capped)
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY n_shared DESC, id_a, id_b""".stripMargin,
    "q98_bigram_logprob" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |bgf AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), i ->
        |          struct_pack(w1 := w[i], w2 := w[i+1]))) AS b
        |        FROM t WHERE len(w) >= 2),
        |bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bgf),
        |bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        |uc AS (SELECT tok, count(*) AS cu FROM
        |         (SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents) GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM
        |         (SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents))
        |SELECT doc_id, count(*) AS n_bigrams,
        |       round(avg(log10(0.7 * CAST(c12 AS DOUBLE) / c1 + 0.3 * CAST(cu AS DOUBLE) / n)), 6) AS avg_logprob
        |FROM bg JOIN bc USING (w1, w2) JOIN c1 USING (w1) JOIN uc ON uc.tok = bg.w2 CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q103_dup_ngram_frac" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |d AS (SELECT doc_id, len(w) AS n, w FROM t WHERE len(w) >= 3),
        |g AS (SELECT doc_id, n, i, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
        |      FROM (SELECT doc_id, n, w, unnest(range(1, len(w) - 1)) AS i FROM d)),
        |dup AS (SELECT doc_id, gram FROM g GROUP BY 1, 2 HAVING count(*) >= 2),
        |cov AS (SELECT doc_id, count(DISTINCT p) AS covered FROM
        |          (SELECT g.doc_id, unnest([g.i, g.i + 1, g.i + 2]) AS p
        |           FROM g JOIN dup USING (doc_id, gram))
        |        GROUP BY 1)
        |SELECT d.doc_id, d.n AS n_tokens,
        |       CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered,
        |       round(CAST(coalesce(cov.covered, 0) AS DOUBLE) / d.n, 6) AS dup_gram_frac
        |FROM d LEFT JOIN cov USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q287_decontam_ngram_curve" -> {
      val legs = Seq(3, 5, 8).map { n =>
        val terms = (1 to n).map(k => s"w[i+$k]").mkString(" || ' ' || ")
        s"""sh$n AS MATERIALIZED (SELECT doc_id,
           |          unnest(list_transform(range(len(w) - ${n - 1}), i -> $terms)) AS s
           |        FROM toks WHERE len(w) >= $n),
           |ev$n AS (SELECT DISTINCT s FROM sh$n WHERE doc_id % 97 = 0),
           |tr$n AS (SELECT sh$n.doc_id, max(CASE WHEN ev$n.s IS NOT NULL THEN 1 END) AS hit
           |         FROM sh$n LEFT JOIN ev$n ON ev$n.s = sh$n.s
           |         WHERE sh$n.doc_id % 97 != 0 GROUP BY 1),
           |m$n AS (SELECT CAST($n AS BIGINT) AS ngram_n,
           |          count(*) AS n_train_docs,
           |          CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_contaminated
           |        FROM tr$n)""".stripMargin
      }.mkString(",\n")
      val unions = Seq(3, 5, 8).map(n => s"SELECT * FROM m$n").mkString(" UNION ALL ")
      "WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),\n" +
        legs +
        s"""\nSELECT ngram_n, n_train_docs, n_contaminated,
           |       round(CAST(n_contaminated AS DOUBLE) / n_train_docs, 6) AS contamination_rate
           |FROM ($unions) ORDER BY ngram_n""".stripMargin
    },
    "q282_dsir_ess" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
        |bt AS (SELECT doc_id, CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT) % 256 AS b FROM toks),
        |tc AS (SELECT b, count(*) AS ct FROM bt WHERE doc_id % 7 = 0 GROUP BY 1),
        |rc AS (SELECT b, count(*) AS cr FROM bt GROUP BY 1),
        |nt AS (SELECT sum(ct) AS n FROM tc),
        |nr AS (SELECT sum(cr) AS n FROM rc),
        |lr AS (SELECT g.b AS b,
        |         round(log10((CAST(coalesce(tc.ct, 0) + 1 AS DOUBLE) / (nt.n + 256)) /
        |                     (CAST(coalesce(rc.cr, 0) + 1 AS DOUBLE) / (nr.n + 256))), 9) AS logratio
        |       FROM (SELECT unnest(range(256)) AS b) g
        |       LEFT JOIN tc ON tc.b = g.b LEFT JOIN rc ON rc.b = g.b
        |       CROSS JOIN nt CROSS JOIN nr),
        |imp AS (SELECT doc_id,
        |          CAST(round(sum(CAST(logratio AS DECIMAL(18,9))), 6) AS DOUBLE) AS importance
        |        FROM bt JOIN lr USING (b) GROUP BY doc_id),
        |w AS (SELECT doc_id, round(pow(10.0, importance), 6) AS w FROM imp),
        |st AS (SELECT d.source, count(*) AS n_docs,
        |         CAST(sum(CAST(w.w AS DECIMAL(18,6))) AS DOUBLE) AS sum_w,
        |         CAST(sum(CAST(round(w.w * w.w, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sum_w2
        |       FROM w JOIN documents d USING (doc_id) GROUP BY 1)
        |SELECT source, n_docs, round(sum_w, 6) AS sum_w,
        |       round(sum_w * sum_w / sum_w2, 6) AS ess,
        |       round(sum_w * sum_w / sum_w2 / n_docs, 6) AS ess_ratio
        |FROM st ORDER BY source""".stripMargin,
    "q100_dsir_weights" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
        |bt AS (SELECT doc_id, CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT) % 256 AS b FROM toks),
        |tc AS (SELECT b, count(*) AS ct FROM bt WHERE doc_id % 7 = 0 GROUP BY 1),
        |rc AS (SELECT b, count(*) AS cr FROM bt GROUP BY 1),
        |nt AS (SELECT sum(ct) AS n FROM tc),
        |nr AS (SELECT sum(cr) AS n FROM rc),
        |lr AS (SELECT g.b AS b,
        |         round(log10((CAST(coalesce(tc.ct, 0) + 1 AS DOUBLE) / (nt.n + 256)) /
        |                     (CAST(coalesce(rc.cr, 0) + 1 AS DOUBLE) / (nr.n + 256))), 9) AS logratio
        |       FROM (SELECT unnest(range(256)) AS b) g
        |       LEFT JOIN tc ON tc.b = g.b LEFT JOIN rc ON rc.b = g.b
        |       CROSS JOIN nt CROSS JOIN nr)
        |SELECT doc_id, count(*) AS n_tokens,
        |       CAST(round(sum(CAST(logratio AS DECIMAL(18,9))), 6) AS DOUBLE) AS importance
        |FROM bt JOIN lr USING (b)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q249_length_quality" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS len,
        |  round(0.5 * least(1.0, length(text) / 500.0)
        |      + 0.3 * (CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to|is)\b')) AS DOUBLE) /
        |               len(string_split(trim(text), ' ')))
        |      + 0.2 * (1.0 - CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) /
        |               length(text)), 6) AS q
        |  FROM documents),
        |b AS (SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY len) AS p25,
        |             percentile_cont(0.50) WITHIN GROUP (ORDER BY len) AS p50,
        |             percentile_cont(0.75) WITHIN GROUP (ORDER BY len) AS p75 FROM s),
        |g AS (SELECT CASE WHEN len <= p25 THEN 1 WHEN len <= p50 THEN 2
        |               WHEN len <= p75 THEN 3 ELSE 4 END AS len_bucket,
        |        count(*) AS n_docs,
        |        round(CAST(CAST(sum(len) AS BIGINT) AS DOUBLE) / count(*), 6) AS avg_len,
        |        round(CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_quality,
        |        CAST(sum(CASE WHEN q >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        |      FROM s, b GROUP BY 1)
        |SELECT CAST(len_bucket AS BIGINT) AS len_bucket, n_docs, avg_len, avg_quality,
        |       n_pass, round(CAST(n_pass AS DOUBLE) / n_docs, 6) AS pass_rate
        |FROM g ORDER BY len_bucket""".stripMargin,
    "q71_curriculum_buckets" ->
      """WITH s AS (SELECT doc_id,
        |  round(0.5 * least(1.0, length(text) / 500.0)
        |      + 0.3 * (CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to|is)\b')) AS DOUBLE) /
        |               len(string_split(trim(text), ' ')))
        |      + 0.2 * (1.0 - CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) /
        |               length(text)), 6) AS score
        |  FROM documents),
        |b AS (SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY score) AS p25,
        |             percentile_cont(0.50) WITHIN GROUP (ORDER BY score) AS p50,
        |             percentile_cont(0.75) WITHIN GROUP (ORDER BY score) AS p75 FROM s)
        |SELECT CASE WHEN score <= p25 THEN 1 WHEN score <= p50 THEN 2
        |            WHEN score <= p75 THEN 3 ELSE 4 END AS bucket,
        |       count(*) AS n_docs, round(avg(score), 6) AS avg_score,
        |       min(score) AS min_score, max(score) AS max_score
        |FROM s, b GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
