package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer-induction statistics over the corpus — the two counting passes
  * a vocabulary-training run is built from:
  *
  *  - adjacent-pair (bigram) frequencies: the per-iteration statistic of
  *    byte-pair encoding (Sennrich, Haddow, Birch, "Neural Machine
  *    Translation of Rare Words with Subword Units", 2016 — each BPE merge
  *    step picks the most frequent adjacent pair; this operator is that
  *    argmax scan expressed as one distributed pass);
  *  - pointwise mutual information collocations (Church & Hanks, "Word
  *    Association Norms, Mutual Information, and Lexicography", 1990):
  *    pairs that co-occur far above chance — multi-word-unit candidates.
  *
  * Scale design: adjacent pairs are generated ROW-LOCALLY from each
  * document's token array (an index-zip lambda — no explode-then-self-join,
  * which would shuffle the token table twice and pair across document
  * boundaries); the only shuffles are the count aggregations keyed on the
  * pair/token, all map-side combined. Corpus totals attach as one-row
  * broadcasts; rankings are bounded top-k (TakeOrderedAndProject). PMI is
  * rounded to 6 decimals BEFORE ranking, and the Spark double expression
  * replays the oracle's operand sequence exactly.
  */
object Tokenizer extends QueryModule {

  /** Chao1 richness report from a `(source, term, n)` occurrence frame —
    * the q309 estimator factored for planted-frame specs. The `undetected`
    * numerator N1·(N1−1) stays in INTEGER space: 0·(−1) as a double is
    * −0.0 in DuckDB (whose round() preserves the sign) but +0.0 after
    * Spark's BigDecimal round — a cross-engine hash divergence whenever a
    * source has no singleton terms (N1=0; 11 of sf0.01's 20 sources). Long
    * 0·−1 = 0 carries no sign bit, so both engines agree — the
    * "0 × negative double product" determinism class, Round16InvariantsSpec. */
  def chao1From(st: DataFrame): DataFrame =
    st.groupBy(col("source"))
      .agg(count(lit(1)).as("n_types"),
        sum(when(col("n") === 1, lit(1L)).otherwise(lit(0L))).as("n1"),
        sum(when(col("n") === 2, lit(1L)).otherwise(lit(0L))).as("n2"))
      .select(col("source"), col("n_types"), col("n1"), col("n2"),
        round((col("n1") * (col("n1") - lit(1L))).cast("double")
          / (lit(2.0) * (col("n2") + lit(1L))), 6).as("undetected"))
      .select(col("source"), col("n_types"), col("n1"), col("n2"),
        col("undetected"),
        round(col("n_types") + col("undetected"), 6).as("chao1"),
        round(col("n_types").cast("double")
          / (col("n_types") + col("undetected")), 6).as("completeness"))
      .orderBy(col("source"))

  /** Adjacent token pairs of each document, exploded: (t1, t2) per
    * occurrence. The zip runs inside the row over the let-bound token
    * array; documents shorter than 2 tokens contribute nothing. */
  private def bigramsOf(docsDf: DataFrame): DataFrame =
    docsDf
      .select(explode(expr(
        // the ELSE branch builds an EMPTY struct array (sequence(1, 0)
        // would descend, pairing w[0] with a null neighbor)
        """flatten(transform(array(split(trim(text), ' ')),
          |  w -> CASE WHEN size(w) >= 2
          |       THEN transform(sequence(1, size(w) - 1),
          |              i -> struct(w[i - 1] AS t1, w[i] AS t2))
          |       ELSE transform(slice(w, 1, 0), x -> struct(x AS t1, x AS t2)) END))""".stripMargin)).as("p"))
      .select(col("p.t1").as("t1"), col("p.t2").as("t2"))

  /** (t1, t2, n_pairs): adjacent-pair frequencies — the BPE merge-candidate
    * table, top `k` by count. */
  def bigramMergeCandidates(docsDf: DataFrame, k: Int = 20): DataFrame =
    bigramsOf(docsDf)
      .groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("t1"), col("t2"))
      .limit(k)

  /** Collocations by PMI over adjacent pairs with count >= `minCount`,
    * top `k` by rounded PMI. */
  def pmiCollocations(docsDf: DataFrame, minCount: Long = 10, k: Int = 20): DataFrame = {
    val uni = docsDf
      .select(explode(split(trim(col("text")), " ")).as("t"))
    val uc = uni.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val un = uni.agg(count(lit(1)).as("u"))
    val big = bigramsOf(docsDf)
    val bc = big.groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("c12"))
    val bn = big.agg(count(lit(1)).as("b"))
    bc.filter(col("c12") >= minCount)
      .join(uc.select(col("t").as("t1"), col("c").as("c1")), "t1")
      .join(uc.select(col("t").as("t2"), col("c").as("c2")), "t2")
      .crossJoin(broadcast(bn))
      .crossJoin(broadcast(un))
      // ln((c12/B) / ((c1/U) * (c2/U))) — the oracle's exact operand order
      .withColumn("pmi", round(log(
        (col("c12").cast("double") / col("b")) /
          ((col("c1").cast("double") / col("u")) * (col("c2").cast("double") / col("u")))), 6))
      .select(col("t1"), col("t2"), col("c12"), col("pmi"))
      .orderBy(col("pmi").desc, col("t1"), col("t2"))
      .limit(k)
  }

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.read(s, dir, "documents")

  /** Shared q368 per-bigram term text — one string, executed verbatim by
    * both engines so the 12-dp pre-rounded doubles agree bitwise (the q206/
    * q310 log10-ratio convention): sc · log₂((bc+1)/(c1+V)), Laplace-
    * smoothed over the corpus vocabulary. */
  private val xentTerm =
    "round(sc * (log10(bc + 1) - log10(c1 + vv)) / log10(2.0), 12)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-source cross-entropy under the CORPUS bigram LM (q368): score
    // each source's text by how surprising it is to a Laplace-smoothed
    // bigram model trained on the whole corpus — the CCNet-style
    // perplexity-filter signal (Wenzek et al., "CCNet: Extracting High
    // Quality Monolingual Datasets from Web Crawl Data", 2020 uses a
    // KenLM; this is the in-engine bigram form): H(src) =
    // −Σ_{(t1,t2)∈src} c_src(t1,t2)·log₂ P(t2|t1) / N_src with
    // P(t2|t1) = (c(t1,t2)+1)/(c(t1·)+V). A high-perplexity source is
    // word salad or far off-distribution; a very low one is boilerplate.
    // Complements q310 (corpus-level conditional entropy — no per-source
    // readout) and q104 (per-doc unigram entropy — no sequence model).
    // One bigram pass keyed (source, t1, t2); the global model is the
    // source-marginalized rollup of the SAME frame (no second
    // tokenization); V rides as a one-row broadcast. The final /N_src is
    // the q315 decimal-mean tie class, so it's emitted by sign-split
    // integer half-up division, never a double divide.
    "q368_source_crossentropy" -> ((s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 12)
      val sb = docs(s, dir)
        .select(col("source"), explode(expr(
          """flatten(transform(array(split(trim(text), ' ')),
            |  w -> CASE WHEN size(w) >= 2
            |       THEN transform(sequence(1, size(w) - 1),
            |              i -> struct(w[i - 1] AS t1, w[i] AS t2))
            |       ELSE transform(slice(w, 1, 0), x -> struct(x AS t1, x AS t2)) END))""".stripMargin)).as("pr"))
        .select(col("source"), col("pr.t1").as("t1"), col("pr.t2").as("t2"))
      val sc = sb.groupBy(col("source"), col("t1"), col("t2"))
        .agg(count(lit(1)).as("sc")).localCheckpoint()
      val bc = sc.groupBy(col("t1"), col("t2")).agg(sum(col("sc")).as("bc"))
      val c1 = bc.groupBy(col("t1")).agg(sum(col("bc")).as("c1"))
      val vdf = docs(s, dir)
        .select(explode(split(trim(col("text")), " ")).as("t"))
        .agg(countDistinct(col("t")).as("vv"))
      sc.join(bc, Seq("t1", "t2")).join(c1, Seq("t1"))
        .crossJoin(broadcast(vdf))
        .groupBy(col("source"))
        .agg(sum(col("sc")).as("n_bigrams"),
          sum(expr(xentTerm).cast(dec)).as("ssum"))
        .select(col("source"), col("n_bigrams"),
          expr("cast((- ssum) * 1000000000000 as decimal(38,0))").as("num"),
          expr("cast(n_bigrams as decimal(38,0)) * 1000000").as("den"))
        .select(col("source"), col("n_bigrams"),
          (expr("case when num >= 0 then (2 * num + den) div (2 * den)" +
            " else -((2 * (- num) + den) div (2 * den)) end")
            .cast("double") / 1e6).as("h_cross"))
        .select(col("source"), col("n_bigrams"), col("h_cross"),
          round(pow(lit(2.0), col("h_cross")), 6).as("perplexity"))
        .orderBy(col("source"))
    }),

    // The BPE argmax scan: most frequent adjacent token pairs.
    "q81_bigram_merges" -> ((s, dir) => bigramMergeCandidates(docs(s, dir))),

    // PMI collocations: adjacent pairs co-occurring above chance.
    "q82_collocation_pmi" -> ((s, dir) => pmiCollocations(docs(s, dir))),

    // Vocabulary head: top terms by total occurrences with document
    // frequency and cumulative corpus coverage — the stat a tokenizer-vocab
    // size decision reads ("how much of the corpus do the top-V terms
    // cover?"). Exact integer counts; the coverage share is one double
    // division per row over the broadcast corpus total, and the running
    // cumulative sums integers INSIDE the bounded top-k (a 30-row window —
    // never a corpus-wide running sum).
    "q96_vocab_head" -> ((s, dir) => {
      val tf = Retrieval.termFreqs(docs(s, dir))
      val terms = tf.groupBy(col("term"))
        .agg(sum(col("tf")).as("n_occ"), count(lit(1)).as("df"))
      val tot = terms.agg(sum(col("n_occ")).as("total"))
      val head = terms
        .orderBy(col("n_occ").desc, col("term"))
        .limit(30)
      val byRank = org.apache.spark.sql.expressions.Window
        .orderBy(col("n_occ").desc, col("term"))
      head.crossJoin(broadcast(tot))
        .withColumn("rank", row_number().over(byRank).cast("long"))
        .withColumn("cum_occ", sum(col("n_occ")).over(
          byRank.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .select(col("rank"), col("term"), col("n_occ"), col("df"),
          round(col("cum_occ").cast("double") / col("total"), 6).as("cum_coverage"))
        .orderBy(col("rank"))
    }),

    // Good-Turing missing mass per source (q305) — Gale & Sampson's
    // estimator of the probability that the NEXT token drawn from a source
    // is a type never seen yet: P0 = N1/N (hapax share of tokens). The
    // "how much vocabulary is this crawl still hiding" readout that says
    // whether more of the same source buys new content or re-treads — the
    // probabilistic complement to q126's Heaps growth fit — plus the first
    // Good-Turing smoothed count r*₁ = 2·N2/N1 (what a singleton's count is
    // actually worth). Pure integer count-of-counts over the shared
    // inverted-index layer keyed (source, term) — two natural-key shuffles,
    // map-side combined, single-division finals.
    "q305_missing_mass" -> ((s, dir) => {
      val st = Retrieval.sharedTermFreqs(s, dir)
        .join(docs(s, dir).select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"), col("term"))
        .agg(sum(col("tf")).as("n"))
      st.groupBy(col("source"))
        .agg(sum(col("n")).as("n_tokens"), count(lit(1)).as("n_types"),
          sum(when(col("n") === 1, lit(1L)).otherwise(lit(0L))).as("n_hapax"),
          sum(when(col("n") === 2, lit(1L)).otherwise(lit(0L))).as("n_dis"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          col("n_hapax"), col("n_dis"),
          round(col("n_hapax").cast("double") / col("n_tokens"), 6).as("p_unseen"),
          when(col("n_hapax") > 0,
            round(lit(2.0) * col("n_dis") / col("n_hapax"), 6))
            .otherwise(lit(null).cast("double")).as("r_star_1"))
        .orderBy(col("source"))
    }),

    // Held-out OOV audit (q323): tokenize the 80% train slice, then measure
    // what fraction of the 20% held-out slice's tokens (and types) a
    // vocabulary built on train would miss — the REALIZED counterpart of
    // q305's Good-Turing missing-mass PREDICTION and the number that
    // decides byte-fallback vs vocab growth in a tokenizer spec. Slices
    // follow the q68 hash-membership discipline (doc_id % 10, append-
    // stable); the train vocabulary participates only as a distinct-term
    // frame in one left join; all counts are exact integers.
    "q323_oov_audit" -> ((s, dir) => {
      val tf = Retrieval.sharedTermFreqs(s, dir)
        .join(docs(s, dir).select(col("doc_id"), col("source")), "doc_id")
      val trainVocab = tf.filter(col("doc_id") % 10 < 8)
        .select(col("term")).distinct().withColumn("seen", lit(1))
      tf.filter(col("doc_id") % 10 >= 8)
        .join(trainVocab, Seq("term"), "left")
        .groupBy(col("source"))
        .agg(sum(col("tf")).as("n_eval_tokens"),
          sum(when(col("seen").isNull, col("tf")).otherwise(lit(0L)))
            .as("n_oov_tokens"),
          countDistinct(col("term")).as("n_eval_types"),
          countDistinct(when(col("seen").isNull, col("term"))).as("n_new_types"))
        .select(col("source"), col("n_eval_tokens"), col("n_oov_tokens"),
          col("n_eval_types"), col("n_new_types"),
          round(col("n_oov_tokens").cast("double") / col("n_eval_tokens"), 6)
            .as("oov_rate"),
          round(col("n_new_types").cast("double") / col("n_eval_types"), 6)
            .as("new_type_rate"))
        .orderBy(col("source"))
    }),

    // Chao1 vocabulary-richness estimate per source (q309): how many word
    // types does the source's full population hold, given what this sample
    // shows? Chao's bias-corrected lower bound S_obs + N1(N1−1)/(2(N2+1))
    // — the ecology estimator corpus linguistics borrowed — read with
    // q305's missing MASS: q305 prices the next token drawn, Chao1 sizes
    // the whole unseen vocabulary, and completeness = S_obs/chao1 is the
    // "how much of this source's lexicon have we even seen" fraction that
    // decides whether crawling more of it can pay. Same integer
    // count-of-counts layer as q305; single-division finals.
    "q309_chao1_richness" -> ((s, dir) => {
      val st = Retrieval.sharedTermFreqs(s, dir)
        .join(docs(s, dir).select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"), col("term"))
        .agg(sum(col("tf")).as("n"))
      chao1From(st)
    }),

    // Corpus conditional bigram entropy (q310): H(w₂|w₁) = H(bigrams) −
    // H(first words) — how predictable the NEXT token is given the current
    // one, in bits. The sequence-level information readout the per-doc
    // unigram entropy (q104) can't see: a corpus of shuffled word salad
    // and one of fluent prose can share unigram stats while their
    // conditional entropies diverge; 2^H is the corpus's bigram perplexity,
    // the number LM folks actually quote. Both entropy terms fall out of
    // ONE adjacent-pair count frame (row-local zip, q81's layout) via the
    // q206 log10-ratio convention (12-dp pre-rounded decimal sums).
    "q310_conditional_entropy" -> ((s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 12)
      val bc = bigramsOf(docs(s, dir))
        .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val bn = bc.agg(sum(col("c")).as("n"))
      def h(keyed: DataFrame, out: String): DataFrame =
        keyed.crossJoin(broadcast(bn))
          .select((col("c").cast("double") / col("n")).as("p"))
          .agg(round(-sum(round(col("p") * log10(col("p")) / log10(lit(2.0)), 12)
            .cast(dec)).cast("double"), 6).as(out))
      val h2 = h(bc, "h_bigram")
      val h1 = h(bc.groupBy(col("t1")).agg(sum(col("c")).as("c")), "h_first")
      bn.crossJoin(h2).crossJoin(h1)
        .select(col("n").as("n_bigrams"), col("h_bigram"), col("h_first"),
          round(col("h_bigram") - col("h_first"), 6).as("h_cond"))
        .select(col("n_bigrams"), col("h_bigram"), col("h_first"), col("h_cond"),
          round(pow(lit(2.0), col("h_cond")), 6).as("perplexity"))
    }),

    // Term burstiness / adaptation (q255) — Church & Gale's observation
    // ("Poisson mixtures", 1995; Church, "Empirical estimates of
    // adaptation", 2000): content words are BURSTY — once a document
    // mentions a term, it tends to mention it again — while function
    // words spread evenly. Two standard statistics per head term: rate =
    // cf/df (mean occurrences per containing doc) and adaptation =
    // P(tf >= 2 | tf >= 1) = df2/df. The tokenizer/stopword read: high-
    // adaptation terms carry topical signal (keep whole in the vocab,
    // index them); low-adaptation high-df terms are function words (the
    // principled stopword list q31/q80 currently hard-code). Same bounded
    // head shape as q96 (30-row window, never corpus-wide); counts ride
    // the shared inverted-index layer.
    "q255_term_burstiness" -> ((s, dir) => {
      val tf = Retrieval.sharedTermFreqs(s, dir)
      val terms = tf.groupBy(col("term"))
        .agg(sum(col("tf")).as("n_occ"), count(lit(1)).as("df"),
          sum(when(col("tf") >= 2, 1L).otherwise(0L)).as("df2"))
      val byRank = org.apache.spark.sql.expressions.Window
        .orderBy(col("n_occ").desc, col("term"))
      terms.orderBy(col("n_occ").desc, col("term")).limit(30)
        .withColumn("rank", row_number().over(byRank).cast("long"))
        .select(col("rank"), col("term"), col("n_occ"), col("df"), col("df2"),
          round(col("n_occ").cast("double") / col("df"), 6).as("rate"),
          round(col("df2").cast("double") / col("df"), 6).as("adaptation"))
        .orderBy(col("rank"))
    }),

    // Zipf head-fit (q115): least-squares slope of log10(freq) on
    // log10(rank) over the top-500 terms — the corpus-health check behind
    // "does this look like natural language?" (clean text fits slope ≈ −1;
    // template/boilerplate floods flatten the head, tokenizer damage
    // steepens it). Closed form from five scalars, each an
    // order-independent sum: x/y are pre-rounded doubles, every summed
    // term re-rounds at 12 dp and accumulates in DECIMAL(38,12), and only
    // the five finished sums convert to double for the identical final
    // arithmetic on either engine. The rank sort is bounded (vocab-sized
    // input, 500-row head), never corpus-sized.
    "q115_zipf_slope" -> ((s, dir) => zipfSlopeFrom(docs(s, dir))),

    // Heaps'-law vocabulary-growth fit (see heapsFitFrom).
    "q126_heaps_fit" -> ((s, dir) => heapsFitFrom(docs(s, dir))),

    // Sketch-then-verify heavy hitters (see heavyHitters; output is exact).
    "q128_heavy_hitters" -> ((s, dir) => heavyHitters(docs(s, dir))),

    // OOV / vocabulary drift (q149): the even-doc_id half stands in for the
    // tokenizer's training corpus, the odd half for a new batch — the rate
    // of new-batch token OCCURRENCES falling outside the old vocabulary,
    // plus the count of genuinely new terms. The "do we need to re-train
    // the tokenizer / re-fit the vocab" gate: occurrence-weighted OOV is
    // what inflates unk-token counts downstream, term-count drift is what
    // grows the vocab. One left-anti equi-join of new-half term counts
    // against the old vocab (term-keyed shuffle — web-scale vocabularies
    // don't broadcast), totals ride as a broadcast 1-row aggregate.
    "q149_oov_rate" -> ((s, dir) => oovRateFrom(docs(s, dir)))
  )

  /** q149's engine over any `(doc_id, text)` frame: even doc_ids are the
    * reference vocabulary, odd doc_ids the new batch (see the q149 query
    * comment for the drift semantics and scale shape). */
  def oovRateFrom(docsDf: DataFrame): DataFrame = {
    val toks = docsDf
      .select((col("doc_id") % 2).as("half"),
        explode(split(trim(col("text")), " ")).as("term"))
    val oldVocab = toks.filter(col("half") === 0).select(col("term")).distinct()
    val newCounts = toks.filter(col("half") === 1)
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val oov = newCounts.join(oldVocab, Seq("term"), "left_anti")
    val tot = newCounts.agg(sum(col("c")).as("n_new_tokens"))
    oov.agg(coalesce(sum(col("c")), lit(0L)).as("n_oov_tokens"),
        count(lit(1)).as("n_new_terms"))
      .crossJoin(broadcast(tot))
      .select(col("n_new_tokens"), col("n_oov_tokens"), col("n_new_terms"),
        when(col("n_new_tokens") > 0,
          round(col("n_oov_tokens").cast("double") / col("n_new_tokens"), 6))
          .as("oov_rate"))
  }

  /** q128: corpus heavy hitters by SKETCH-THEN-VERIFY — the two-pass shape
    * that finds every term above a frequency threshold WITHOUT shuffling
    * the full vocabulary:
    *
    *  1. sketch pass: each partition runs a Misra–Gries counter set
    *     (Misra & Gries 1982, "Finding repeated elements"; k counters,
    *     decrement-all on overflow) over its own tokens via
    *     `mapPartitions` — the sanctioned per-partition imperative hook;
    *     only ≤ k candidate terms per partition leave the executors' scan,
    *     not the (web-scale) vocabulary. The superset guarantee is exact:
    *     if a term's GLOBAL count exceeds n/k, then on at least one
    *     partition its local count exceeds that partition's n_p/k (else
    *     summing the per-partition bounds contradicts the global count),
    *     and Misra–Gries retains every such term. With k = 256 any
    *     support ≥ 1/256 is covered — 2% here, safely above;
    *  2. verify pass: the (tiny) candidate union BROADCASTS back onto a
    *     second corpus scan; exact counts come only for candidates, and
    *     the threshold filter runs on those exact counts.
    *
    * The output is therefore EXACT — identical to the full group-by — so
    * the DuckDB oracle replays it directly; what the sketch buys at 100 TB
    * is the shuffle: candidate-only rows instead of every distinct term. */
  def heavyHitters(docsDf: DataFrame, support: Double = 0.02, k: Int = 256): DataFrame = {
    require(support >= 1.0 / k, s"support $support below the sketch guarantee 1/$k")
    val s = docsDf.sparkSession
    import s.implicits._
    val toks = docsDf.select(explode(split(trim(col("text")), " ")).as("term"))
    val candidates = toks.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        if (counters.contains(t)) counters(t) += 1
        else if (counters.size < k) counters(t) = 1
        else {
          // decrement-all: the O(k) amortized overflow step
          val dead = counters.iterator.collect { case (key, 1L) => key }.toList
          counters.keysIterator.toList.foreach(key => counters(key) -= 1)
          dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.distinct().toDF("term")
    val tot = toks.agg(count(lit(1)).as("total"))
    toks.join(broadcast(candidates), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n_occ"))
      .crossJoin(broadcast(tot))
      .filter(col("n_occ") >= col("total") * support)
      .select(col("term"), col("n_occ"),
        round(col("n_occ").cast("double") / col("total"), 6).as("share"))
      .orderBy(col("n_occ").desc, col("term"))
  }

  /** Closed-form least-squares fit over a 2-column `(x, y)` frame — the
    * global (ungrouped) form of [[graft.functions.Ols.fit]], which holds
    * the numeric discipline (decimal-summed moments, guarded denominator).
    * The first output column is named `countAs` (q115 reports ranked
    * terms, q126 reports growth checkpoints). */
  def logLogFit(xy: DataFrame, countAs: String): DataFrame =
    graft.functions.Ols.fit(xy, Nil, countAs)

  /** q115's engine: least-squares (slope, intercept) of log10(freq) on
    * log10(rank) over the `headK` most frequent whitespace tokens of
    * `docsDf.text` (see the q115 query comment for the numeric
    * discipline). */
  def zipfSlopeFrom(docsDf: DataFrame, headK: Int = 500): DataFrame = {
    val terms = docsDf
      .select(explode(split(trim(col("text")), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n_occ"))
    val byRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_occ").desc, col("term"))
    val xy = terms.orderBy(col("n_occ").desc, col("term")).limit(headK)
      .withColumn("rank", row_number().over(byRank).cast("double"))
      .select(round(log10(col("rank")), 6).as("x"),
        round(log10(col("n_occ").cast("double")), 6).as("y"))
    logLogFit(xy, "n_terms")
  }

  /** q126: Heaps'-law fit — vocabulary growth V(n) ≈ K·n^β against tokens
    * seen, the companion diagnostic to [[zipfSlopeFrom]] (natural text has
    * β ≈ 0.5–0.8; β → 1 means near-random tokens — tokenizer damage or
    * binary contamination; β → 0 means a closed template vocabulary). The
    * curve is computed WITHOUT quadratic prefix re-scans: each term
    * attributes itself to its FIRST document (min doc_id — one term-keyed
    * aggregation), per-doc new-term counts join the per-doc token counts,
    * and the two running sums over doc order run as a DISTRIBUTED prefix
    * sum — the classic two-phase scan: doc_id-aligned blocks accumulate
    * in parallel (windows partitioned by block), per-block totals prefix
    * once over the #docs/`blockSize` rollup, and the broadcast offsets
    * add back in. No corpus-sized single-partition sort anywhere; the one
    * unpartitioned window sorts the block rollup (ExplainAudit classifies
    * it). Integer sums, so the blocked decomposition is value-identical
    * to the naive window and the oracle replays it unchanged. */
  def heapsFitFrom(docsDf: DataFrame, blockSize: Long = 4096L): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    // Two independent cheap passes instead of one shared exploded frame:
    //  - per-doc token counts are ROW-LOCAL (`size(split(...))` — no
    //    explode, no shuffle, value-identical to counting exploded rows);
    //  - first-occurrence attribution dedups terms PER DOC (`array_distinct`)
    //    before exploding, so the term-keyed min shuffle carries each
    //    (doc, term) once, not once per occurrence — ~2× fewer shuffled rows
    //    on natural text, identical min(doc_id) result.
    // (The old shape tokenized the corpus twice through a shared explode and
    // shuffled every token occurrence — measured 2.8× slower at sf0.1.)
    val perDoc = docsDf.select(col("doc_id"),
      size(split(trim(col("text")), " ")).cast("long").as("n_toks"))
    val firstSeen = docsDf.select(col("doc_id"),
        explode(array_distinct(split(trim(col("text")), " "))).as("term"))
      .groupBy(col("term")).agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("new_terms"))
    val blocked = perDoc
      .join(firstSeen, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("new_terms"), lit(0L)).as("new_terms"))
      .withColumn("blk", floor(col("doc_id") / lit(blockSize)))
    val inBlk = W.partitionBy(col("blk")).orderBy(col("doc_id"))
      .rowsBetween(W.unboundedPreceding, 0)
    val byBlk = W.orderBy(col("blk")).rowsBetween(W.unboundedPreceding, -1)
    val blockOffs = blocked.groupBy(col("blk"))
      .agg(sum(col("n_toks")).as("bt"), sum(col("new_terms")).as("bv"))
      .select(col("blk"),
        coalesce(sum(col("bt")).over(byBlk), lit(0L)).as("off_t"),
        coalesce(sum(col("bv")).over(byBlk), lit(0L)).as("off_v"))
    val xy = blocked
      .select(col("blk"), col("doc_id"),
        sum(col("n_toks")).over(inBlk).as("ct"),
        sum(col("new_terms")).over(inBlk).as("cv"))
      .join(broadcast(blockOffs), "blk")
      .select((col("ct") + col("off_t")).as("cum_toks"),
        (col("cv") + col("off_v")).as("cum_vocab"))
      .filter(col("cum_toks") > 0 && col("cum_vocab") > 0)
      .select(round(log10(col("cum_toks").cast("double")), 6).as("x"),
        round(log10(col("cum_vocab").cast("double")), 6).as("y"))
    logLogFit(xy, "n_points")
  }

  val oracles: Map[String, String] = Map(
    "q368_source_crossentropy" ->
      s"""WITH toks AS (SELECT doc_id, source, string_split(trim(text), ' ') AS w
         |              FROM documents),
         |big AS (SELECT source,
         |          unnest(list_transform(range(len(w) - 1), i -> {'t1': w[i+1], 't2': w[i+2]})) AS p
         |        FROM toks WHERE len(w) >= 2),
         |sc AS (SELECT source, p.t1 AS t1, p.t2 AS t2, count(*) AS sc FROM big GROUP BY 1, 2, 3),
         |bc AS (SELECT t1, t2, CAST(sum(sc) AS BIGINT) AS bc FROM sc GROUP BY 1, 2),
         |c1 AS (SELECT t1, CAST(sum(bc) AS BIGINT) AS c1 FROM bc GROUP BY 1),
         |vv AS (SELECT count(DISTINCT t) AS vv
         |       FROM (SELECT unnest(string_split(trim(text), ' ')) AS t FROM documents)),
         |ag AS (SELECT source, CAST(sum(sc) AS BIGINT) AS n_bigrams,
         |         sum(CAST($xentTerm AS DECIMAL(38,12))) AS ssum
         |       FROM sc JOIN bc USING (t1, t2) JOIN c1 USING (t1) CROSS JOIN vv
         |       GROUP BY 1),
         |hx AS (SELECT source, n_bigrams,
         |         CAST((- ssum) * 1000000000000 AS HUGEINT) AS num,
         |         CAST(n_bigrams AS HUGEINT) * 1000000 AS den
         |       FROM ag)
         |SELECT source, n_bigrams,
         |       CAST(CASE WHEN num >= 0 THEN (2 * num + den) // (2 * den)
         |                 ELSE -((2 * (- num) + den) // (2 * den)) END AS DOUBLE) / 1e6 AS h_cross,
         |       round(pow(2.0, CAST(CASE WHEN num >= 0 THEN (2 * num + den) // (2 * den)
         |                 ELSE -((2 * (- num) + den) // (2 * den)) END AS DOUBLE) / 1e6), 6) AS perplexity
         |FROM hx ORDER BY source""".stripMargin,
    "q305_missing_mass" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |st AS (SELECT d.source, tf.term, CAST(sum(tf.tf) AS BIGINT) AS n
        |       FROM tf JOIN documents d USING (doc_id) GROUP BY 1, 2),
        |m AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens, count(*) AS n_types,
        |        CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |        CAST(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis
        |      FROM st GROUP BY 1)
        |SELECT source, n_tokens, n_types, n_hapax, n_dis,
        |       round(CAST(n_hapax AS DOUBLE) / n_tokens, 6) AS p_unseen,
        |       CASE WHEN n_hapax > 0 THEN round(2.0 * n_dis / n_hapax, 6)
        |            ELSE NULL END AS r_star_1
        |FROM m ORDER BY source""".stripMargin,
    "q323_oov_audit" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |tj AS (SELECT tf.doc_id, tf.term, tf.tf, d.source
        |       FROM tf JOIN documents d USING (doc_id)),
        |vocab AS (SELECT DISTINCT term FROM tj WHERE doc_id % 10 < 8),
        |ev AS (SELECT tj.source, tj.term, tj.tf,
        |         CASE WHEN vocab.term IS NULL THEN 1 ELSE 0 END AS oov
        |       FROM tj LEFT JOIN vocab USING (term)
        |       WHERE tj.doc_id % 10 >= 8)
        |SELECT source,
        |       CAST(sum(tf) AS BIGINT) AS n_eval_tokens,
        |       CAST(sum(CASE WHEN oov = 1 THEN tf ELSE 0 END) AS BIGINT) AS n_oov_tokens,
        |       count(DISTINCT term) AS n_eval_types,
        |       count(DISTINCT CASE WHEN oov = 1 THEN term END) AS n_new_types,
        |       round(CAST(sum(CASE WHEN oov = 1 THEN tf ELSE 0 END) AS DOUBLE) / sum(tf), 6) AS oov_rate,
        |       round(CAST(count(DISTINCT CASE WHEN oov = 1 THEN term END) AS DOUBLE)
        |             / count(DISTINCT term), 6) AS new_type_rate
        |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin,
    "q309_chao1_richness" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |st AS (SELECT d.source, tf.term, CAST(sum(tf.tf) AS BIGINT) AS n
        |       FROM tf JOIN documents d USING (doc_id) GROUP BY 1, 2),
        |m AS (SELECT source, count(*) AS n_types,
        |        CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |        CAST(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |      FROM st GROUP BY 1),
        |u AS (SELECT source, n_types, n1, n2,
        |        round(CAST(n1 * (n1 - 1) AS DOUBLE) / (2.0 * (n2 + 1)), 6) AS undetected
        |      FROM m)
        |SELECT source, n_types, n1, n2, undetected,
        |       round(n_types + undetected, 6) AS chao1,
        |       round(CAST(n_types AS DOUBLE) / (n_types + undetected), 6) AS completeness
        |FROM u ORDER BY source""".stripMargin,
    "q310_conditional_entropy" ->
      """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |big AS (SELECT unnest(list_transform(range(len(w) - 1), i -> {'t1': w[i+1], 't2': w[i+2]})) AS p
        |        FROM toks WHERE len(w) >= 2),
        |bc AS (SELECT p.t1 AS t1, p.t2 AS t2, count(*) AS c FROM big GROUP BY 1, 2),
        |bn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM bc),
        |h2 AS (SELECT round(-CAST(sum(CAST(round(
        |           (CAST(c AS DOUBLE) / bn.n) * log10(CAST(c AS DOUBLE) / bn.n) / log10(2.0),
        |           12) AS DECIMAL(38,12))) AS DOUBLE), 6) AS h_bigram
        |       FROM bc CROSS JOIN bn),
        |h1 AS (SELECT round(-CAST(sum(CAST(round(
        |           (CAST(c AS DOUBLE) / bn.n) * log10(CAST(c AS DOUBLE) / bn.n) / log10(2.0),
        |           12) AS DECIMAL(38,12))) AS DOUBLE), 6) AS h_first
        |       FROM (SELECT t1, CAST(sum(c) AS BIGINT) AS c FROM bc GROUP BY 1) CROSS JOIN bn),
        |x AS (SELECT bn.n AS n_bigrams, h_bigram, h_first,
        |        round(h_bigram - h_first, 6) AS h_cond
        |      FROM bn CROSS JOIN h2 CROSS JOIN h1)
        |SELECT n_bigrams, h_bigram, h_first, h_cond,
        |       round(pow(2.0, h_cond), 6) AS perplexity
        |FROM x""".stripMargin,
    "q81_bigram_merges" ->
      """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |big AS (SELECT unnest(list_transform(range(len(w) - 1), i -> {'t1': w[i+1], 't2': w[i+2]})) AS p
        |        FROM toks WHERE len(w) >= 2),
        |cnt AS (SELECT p.t1 AS t1, p.t2 AS t2, count(*) AS n_pairs FROM big GROUP BY 1, 2)
        |SELECT t1, t2, n_pairs FROM cnt ORDER BY n_pairs DESC, t1, t2 LIMIT 20""".stripMargin,
    "q82_collocation_pmi" ->
      """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |uni AS (SELECT unnest(w) AS t FROM toks),
        |uc AS (SELECT t, count(*) AS c FROM uni GROUP BY t),
        |un AS (SELECT count(*) AS u FROM uni),
        |big AS (SELECT unnest(list_transform(range(len(w) - 1), i -> {'t1': w[i+1], 't2': w[i+2]})) AS p
        |        FROM toks WHERE len(w) >= 2),
        |bc AS (SELECT p.t1 AS t1, p.t2 AS t2, count(*) AS c12 FROM big GROUP BY 1, 2),
        |bn AS (SELECT count(*) AS b FROM big),
        |pmi AS (SELECT t1, t2, c12,
        |               round(ln((CAST(c12 AS DOUBLE) / bn.b) /
        |                        ((CAST(a.c AS DOUBLE) / un.u) * (CAST(d.c AS DOUBLE) / un.u))), 6) AS pmi
        |        FROM bc JOIN uc a ON a.t = bc.t1 JOIN uc d ON d.t = bc.t2
        |        CROSS JOIN bn CROSS JOIN un
        |        WHERE c12 >= 10)
        |SELECT t1, t2, c12, pmi FROM pmi ORDER BY pmi DESC, t1, t2 LIMIT 20""".stripMargin,
    "q255_term_burstiness" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |terms AS (SELECT term, CAST(sum(tf) AS BIGINT) AS n_occ, count(*) AS df,
        |            CAST(sum(CASE WHEN tf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |          FROM tf GROUP BY term),
        |head AS (SELECT * FROM terms ORDER BY n_occ DESC, term LIMIT 30),
        |r AS (SELECT *, row_number() OVER (ORDER BY n_occ DESC, term) AS rank FROM head)
        |SELECT rank, term, n_occ, df, df2,
        |       round(CAST(n_occ AS DOUBLE) / df, 6) AS rate,
        |       round(CAST(df2 AS DOUBLE) / df, 6) AS adaptation
        |FROM r ORDER BY rank""".stripMargin,
    "q96_vocab_head" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |terms AS (SELECT term, CAST(sum(tf) AS BIGINT) AS n_occ, count(*) AS df FROM tf GROUP BY term),
        |tot AS (SELECT sum(n_occ) AS total FROM terms),
        |head AS (SELECT term, n_occ, df FROM terms ORDER BY n_occ DESC, term LIMIT 30),
        |r AS (SELECT term, n_occ, df,
        |             row_number() OVER (ORDER BY n_occ DESC, term) AS rank,
        |             sum(n_occ) OVER (ORDER BY n_occ DESC, term ROWS UNBOUNDED PRECEDING) AS cum_occ
        |      FROM head)
        |SELECT rank, term, n_occ, df,
        |       round(CAST(cum_occ AS DOUBLE) / total, 6) AS cum_coverage
        |FROM r CROSS JOIN tot ORDER BY rank""".stripMargin,
    "q149_oov_rate" ->
      """WITH toks AS (SELECT doc_id % 2 AS half, unnest(string_split(trim(text), ' ')) AS term
        |              FROM documents),
        |old_vocab AS (SELECT DISTINCT term FROM toks WHERE half = 0),
        |nc AS (SELECT term, count(*) AS c FROM toks WHERE half = 1 GROUP BY term),
        |oov AS (SELECT nc.term, nc.c FROM nc
        |        WHERE nc.term NOT IN (SELECT term FROM old_vocab)),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_new_tokens FROM nc)
        |SELECT n_new_tokens,
        |       CAST(COALESCE((SELECT sum(c) FROM oov), 0) AS BIGINT) AS n_oov_tokens,
        |       (SELECT count(*) FROM oov) AS n_new_terms,
        |       CASE WHEN n_new_tokens > 0 THEN
        |         round(CAST(COALESCE((SELECT sum(c) FROM oov), 0) AS DOUBLE) / n_new_tokens, 6)
        |       END AS oov_rate
        |FROM tot""".stripMargin,
    // The sketch is invisible in the result — the oracle is the plain
    // threshold group-by the two-pass plan reproduces exactly.
    "q128_heavy_hitters" ->
      """WITH toks AS (SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents),
        |tot AS (SELECT count(*) AS total FROM toks)
        |SELECT term, count(*) AS n_occ,
        |       round(CAST(count(*) AS DOUBLE) / total, 6) AS share
        |FROM toks CROSS JOIN tot
        |GROUP BY term, total
        |HAVING count(*) >= total * 0.02
        |ORDER BY n_occ DESC, term""".stripMargin,
    "q126_heaps_fit" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents),
        |pd AS (SELECT doc_id, count(*) AS n_toks FROM toks GROUP BY doc_id),
        |fs AS (SELECT doc_id, count(*) AS new_terms FROM
        |        (SELECT term, min(doc_id) AS doc_id FROM toks GROUP BY term) GROUP BY doc_id),
        |cum AS (SELECT sum(pd.n_toks) OVER (ORDER BY pd.doc_id ROWS UNBOUNDED PRECEDING) AS cum_toks,
        |               sum(COALESCE(fs.new_terms, 0)) OVER (ORDER BY pd.doc_id ROWS UNBOUNDED PRECEDING) AS cum_vocab
        |        FROM pd LEFT JOIN fs USING (doc_id)),
        |xy AS (SELECT round(log10(CAST(cum_toks AS DOUBLE)), 6) AS x,
        |              round(log10(CAST(cum_vocab AS DOUBLE)), 6) AS y
        |       FROM cum WHERE cum_toks > 0 AND cum_vocab > 0),
        |s AS (SELECT count(*) AS n,
        |        CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
        |        CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
        |        CAST(sum(CAST(round(x * y, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
        |        CAST(sum(CAST(round(x * x, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sxx
        |      FROM xy)
        |SELECT n AS n_points,
        |       CASE WHEN n * sxx - sx * sx <> 0 THEN
        |         round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) END AS slope,
        |       CASE WHEN n * sxx - sx * sx <> 0 THEN
        |         round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) END AS intercept
        |FROM s""".stripMargin,
    "q115_zipf_slope" ->
      """WITH toks AS (SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents),
        |terms AS (SELECT term, count(*) AS n_occ FROM toks GROUP BY term),
        |head AS (SELECT term, n_occ FROM terms ORDER BY n_occ DESC, term LIMIT 500),
        |xy AS (SELECT round(log10(CAST(row_number() OVER (ORDER BY n_occ DESC, term) AS DOUBLE)), 6) AS x,
        |              round(log10(CAST(n_occ AS DOUBLE)), 6) AS y
        |       FROM head),
        |s AS (SELECT count(*) AS n,
        |        CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
        |        CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
        |        CAST(sum(CAST(round(x * y, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
        |        CAST(sum(CAST(round(x * x, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sxx
        |      FROM xy)
        |SELECT n AS n_terms,
        |       CASE WHEN n * sxx - sx * sx <> 0 THEN
        |         round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) END AS slope,
        |       CASE WHEN n * sxx - sx * sx <> 0 THEN
        |         round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) END AS intercept
        |FROM s""".stripMargin
  )
}
