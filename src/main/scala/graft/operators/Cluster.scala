package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTER formation — the step that turns pairwise dedup
  * output (q35/q36/q58/q47) into an actually deduplicated corpus. Pairs
  * alone under-merge: near-duplication is transitive in practice (A≈B, B≈C
  * ⇒ keep one of {A,B,C}), so the pair graph must be collapsed into
  * connected components and one survivor kept per component. The fixture
  * corpus contains such a transitive triple, so the oracle comparison
  * exercises real multi-hop merging, not just pair relabeling.
  *
  * Components are computed with alternating Large-Star / Small-Star
  * contraction (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
  * "Connected Components in MapReduce and Beyond", SoCC 2014): each round
  * rewires every node's strictly-greater neighbors (large-star) and then its
  * smaller neighbors (small-star) to the minimum of its closed neighborhood.
  * The edge set converges to per-component stars rooted at the component
  * minimum in O(log² n) rounds REGARDLESS of graph diameter — a 64-node
  * chain converges in ~6 rounds where naive min-label propagation needs 64
  * (asserted in ClusterSpec).
  *
  * Scale design (the part that matters at 100 TB):
  *  - a round is two shuffled min-aggregations + two equi-joins over narrow
  *    (BIGINT, BIGINT) edge rows — never a neighbor-list `collect_set` (a
  *    hot node under star contraction can accumulate millions of neighbors;
  *    as a map-side-combined `min` aggregate it costs one long per task,
  *    as a list row it would OOM the reducer);
  *  - per-round `localCheckpoint` truncates the iterative lineage so the
  *    plan does not grow exponentially with rounds (on a multi-executor
  *    cluster a reliable `checkpoint` to the DFS does the same job with
  *    fault tolerance across executor loss);
  *  - convergence is detected from a per-round (count, hash-sum) scalar
  *    aggregate — a driver-side SCALAR, never a collected edge list;
  *  - the driver loop is O(log² n) rounds, each a constant number of jobs.
  *
  * Reference scope: the reference pipeline dedups by exact key only
  * (`glue/etl_api.py:31`); cluster-collapse is part of the training-data
  * tier this engine adds on top (SURVEY §2 extension table).
  */
object Cluster extends QueryModule {

  /** Canonical undirected edge list: (u, v) with u < v, self-loops dropped,
    * duplicates collapsed. */
  private def canon(ab: DataFrame): DataFrame =
    ab.select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** Connected components of an undirected graph given as an `(a, b)` edge
    * frame (any orientation, duplicates/self-loops tolerated). Returns
    * `(node, cluster_id)` for every NON-ROOT node, where cluster_id is the
    * component's minimum node id; roots and isolated nodes are absent (their
    * label is their own id — join with coalesce, see [[dedupClusters]]).
    * Also returns the round count (for the convergence-rate spec). */
  def connectedComponentsWithRounds(edges0: DataFrame, maxRounds: Int = 30): (DataFrame, Int) = {
    def fingerprint(e: DataFrame): (Long, String) = {
      // hash-sum in DECIMAL(38,0): xxhash64 spans the full long range and a
      // long sum would trip ANSI overflow on ~3 edges
      val r = e.agg(count(lit(1)), sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
      (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toString)
    }
    var edges = canon(edges0).localCheckpoint()
    var fp = fingerprint(edges)
    var rounds = 0
    var done = fp._1 == 0L
    while (!done && rounds < maxRounds) {
      // Large-star: m(u) = min(Γ(u) ∪ {u}); rewire every neighbor v > u to
      // m(u). The min is computed over the symmetrized edges as a plain
      // aggregate (map-side combine), then joined back — no neighbor lists.
      val sym = edges.select(col("u"), col("v"))
        .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      val lsMin = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = canon(
        sym.filter(col("v") > col("u")).join(lsMin, "u")
          .select(col("v").as("a"), col("m").as("b")))
      // Small-star on the canonical (u < v) orientation: for each node v,
      // m = min of its smaller neighbors; rewire those neighbors and v to m.
      val ssMin = ls.groupBy(col("v")).agg(min(col("u")).as("m"))
      val ss = canon(
        ls.join(ssMin, "v").select(col("u").as("a"), col("m").as("b"))
          .unionAll(ssMin.select(col("v").as("a"), col("m").as("b"))))
      val next = ss.localCheckpoint()
      val fp2 = fingerprint(next)
      done = fp2 == fp
      fp = fp2
      edges = next
      rounds += 1
    }
    require(done, s"connected components did not converge in $maxRounds rounds")
    // At the fixpoint the edge set is per-component stars (root = component
    // min on the u side); min() per node is a belt on top of the theorem.
    (edges.groupBy(col("v")).agg(min(col("u")).as("cluster_id"))
      .select(col("v").as("node"), col("cluster_id")), rounds)
  }

  /** [[connectedComponentsWithRounds]] without the round count. */
  def connectedComponents(edges0: DataFrame, maxRounds: Int = 30): DataFrame =
    connectedComponentsWithRounds(edges0, maxRounds)._1

  /** (doc_id, cluster_id) for EVERY document: near-dup edges are the exact
    * n-gram Jaccard pairs at `threshold` (the q35 pipeline — inverted-index
    * join, never all-pairs, posting lists df-capped at `dfCap` =
    * [[Dedup.DefaultDfCap]]; the cap drops boilerplate-only pairs, so
    * recall at the threshold is over organic shingles — the trade
    * documented at [[Dedup.sharedShinglePairCounts]]), collapsed into
    * components; documents in no pair keep their own id (singleton
    * clusters). Pairs come from the process-level materialized edge layer
    * ([[Dedup.sharedNgramJaccardPairs]]), so the shingling pipeline runs
    * once per (session, dir) across all cluster-tier queries. */
  def dedupClusters(s: SparkSession, dir: String, threshold: Double = 0.8,
                    dfCap: Int = Dedup.DefaultDfCap): DataFrame = {
    val edges = Dedup.sharedNgramJaccardPairs(s, dir, dfCap)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val labels = connectedComponents(edges)
    Tables.read(s, dir, "documents")
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
  }

  /** PageRank over an undirected `(a, b)` edge frame, restricted to
    * `nodes0` (one `node` column covering every vertex, edge-incident or
    * isolated). The canonical iterative-graph shape on Spark:
    *
    *  - each of the `iters` rounds is ONE narrow equi-join (edge × rank,
    *    keyed on the source node) followed by ONE partial-aggregating sum
    *    keyed on the destination — (BIGINT, DOUBLE) rows only, never an
    *    adjacency list, so a celebrity node costs map-side-combined
    *    additions rather than a reducer-resident neighbor array;
    *  - out-degrees are computed once and ride along the checkpointed edge
    *    frame; per-round `localCheckpoint` truncates the lineage exactly as
    *    in [[connectedComponentsWithRounds]] (a durable `checkpoint` on a
    *    real cluster);
    *  - only the two driver scalars (node count, loop index) ever leave the
    *    executors.
    *
    * Dangling nodes (no out-edges) re-emit nothing — their damped mass
    * leaks rather than redistributing, the simple deterministic variant
    * (documented; both engines compute the identical recurrence, and rank
    * ORDER is unaffected for the uniform-teleport case). Returns
    * `(node, r)` unrounded. */
  def pageRankFrom(nodes0: DataFrame, edges0: DataFrame,
                   iters: Int = 6, damping: Double = 0.85): DataFrame = {
    val nodes = nodes0.select(col("node")).localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank needs at least one node")
    val sym = canon(edges0.select(col("a"), col("b")))
    val e = sym.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(sym.select(col("v").as("src"), col("u").as("dst")))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edges = e.join(deg, "src").localCheckpoint()
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edges.join(ranks, col("src") === col("node"))
        .groupBy(col("dst")).agg(sum(col("r") / col("deg")).as("m"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit((1 - damping) / n) + lit(damping) * coalesce(col("m"), lit(0.0))).as("r"))
        .localCheckpoint()
    }
    ranks
  }

  /** Synchronous label propagation over an undirected `(a, b)` edge frame,
    * restricted to `nodes0` (one `node` column). Each of the `rounds`
    * rounds reads ONLY round-(t−1) labels: every node's new label is its
    * neighbors' most frequent label, ties to the lowest label id; a node
    * with no neighbors (or no update) keeps its label. Labels initialize
    * to the node id. Deterministic by construction (integer counts +
    * total-order tiebreak + fixed round count), so the DuckDB oracle
    * replays it as unrolled CTE rounds. Returns `(node, lbl)`.
    *
    * Scale shape per round: one (BIGINT,BIGINT) equi-join of the
    * symmetrized edges against the label frame, a map-side-combined
    * (node,label) count, and an argmax via `max(struct)` — never a
    * collected neighbor list; `localCheckpoint` truncates the iterative
    * lineage exactly as in [[connectedComponentsWithRounds]]. */
  def labelPropagationFrom(nodes0: DataFrame, edges0: DataFrame,
                           rounds: Int = 4): DataFrame = {
    val nodes = nodes0.select(col("node")).localCheckpoint()
    val sym0 = canon(edges0.select(col("a"), col("b")))
    val sym = sym0.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(sym0.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint()
    var lab = nodes.select(col("node"), col("node").as("lbl"))
    for (_ <- 1 to rounds) {
      val best = sym.join(lab, col("src") === col("node"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("dst").as("node"), (-col("m.nl")).as("newlbl"))
      lab = lab.join(best, Seq("node"), "left")
        .select(col("node"), coalesce(col("newlbl"), col("lbl")).as("lbl"))
        .localCheckpoint()
    }
    lab
  }

  /** Triangle census over a canonical `(u, v)` edge frame: exact triangle
    * count, wedge (length-2 path) count, and the global clustering
    * coefficient 3·triangles/wedges — the graph-cohesion statistic that
    * separates a near-dup graph of tight template families (cc → 1) from
    * chains of marginal pairwise matches (cc → 0), i.e. whether collapsing
    * components (q76) merges true duplicate groups or daisy-chains.
    *
    * The u<v orientation counts each triangle exactly ONCE as
    * (e1.u<e1.v=e2.u<e2.v) + the closing edge — two narrow equi-joins on
    * single BIGINT keys, never a cartesian. Join fan-out per key is the
    * out-degree under the orientation; at 100 TB the standard hardening is
    * orienting by (degree, id) instead of raw id — bounds out-degree by
    * O(√m) for any power-law graph — an orientation change only, the count
    * is invariant. Wedges are Σ d(d−1)/2 over symmetrized degrees —
    * map-side-combined counts, k rows. The (tiny) edge frame is
    * localCheckpointed once so the three self-join legs and the degree scan
    * read materialized rows instead of re-running the upstream pair
    * pipeline. */
  def triangleCensus(edges0: DataFrame): DataFrame = {
    val e = canon(edges0.select(col("u").as("a"), col("v").as("b"))).localCheckpoint()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e2.u") === col("e1.v"))
      .join(e.as("e3"), col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .agg(count(lit(1)).as("n_triangles"))
    val wedges = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .agg(coalesce((sum(col("d") * (col("d") - 1)) / 2).cast("bigint"), lit(0L))
        .as("n_wedges"))
    e.agg(count(lit(1)).as("n_edges")).crossJoin(tri).crossJoin(wedges)
      .select(col("n_edges"), col("n_triangles"), col("n_wedges"),
        round(when(col("n_wedges") === 0, lit(0.0))
          .otherwise(lit(3.0) * col("n_triangles") / col("n_wedges")), 6).as("global_cc"))
  }

  /** The resolved-entity label frame (node = p_partkey, cluster_id =
    * component min) through the session model layer — the Dedup.shared*
    * lifecycle: the complete fuzzy edge set plus its connected components is
    * an ingest-cadence artifact (an MDM system publishes the resolved
    * entity table; consumers join it), so the first caller per (session,
    * dir) resolves and `localCheckpoint`s, and every q217-style rollup
    * serves from the materialization. `-Dgraft.noEdgeCache=1` bypasses for
    * ScaleCheck honesty. Membership is COMPLETE: each component's min
    * member appears mapped to itself (the CC label table omits it — the
    * q76 coalesce convention). */
  private val entityLabelCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
  def sharedEntityLabels(s: SparkSession, dir: String): DataFrame = {
    def fresh = {
      val parts = Tables.read(s, dir, "part")
        .select(col("p_partkey"), col("p_name"))
      val edges = Dedup.fuzzyPairsAllFrom(parts)
        .select(col("key_a").as("a"), col("key_b").as("b"))
      val nodes = edges.select(col("a").as("node"))
        .unionAll(edges.select(col("b").as("node"))).distinct()
      nodes.join(connectedComponents(edges), Seq("node"), "left")
        .select(col("node"), coalesce(col("cluster_id"), col("node")).as("cluster_id"))
    }
    if (sys.props.get("graft.noEdgeCache").contains("1")) return fresh
    if (entityLabelCache.size > 4) entityLabelCache.clear()
    entityLabelCache.computeIfAbsent((s.sparkContext.applicationId, dir),
      _ => fresh.localCheckpoint())
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Triangle census of the near-dup graph (see triangleCensus).
    "q114_triangle_census" -> ((s, dir) =>
      triangleCensus(Dedup.sharedNgramJaccardPairs(s, dir)
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a").as("u"), col("id_b").as("v")))),

    // Cross-source duplication matrix (q125): near-dup pair counts by
    // unordered source pair — the provenance view pairwise output can't
    // give directly: diagonal cells are within-source template families
    // (fix the source's extractor), off-diagonal cells are cross-source
    // copying (mirror sites, syndication) — the signal that decides which
    // source to DROP wholesale before paying for per-document dedup. The
    // J>=0.8 pairs are tiny by construction, so the two doc-metadata
    // lookups are plain doc_id equi-joins (AQE broadcasts the pair side);
    // sources canonicalize with least/greatest so (a,b) and (b,a) land in
    // one cell; the final rollup is |sources|² bounded.
    "q125_cross_source_dups" -> ((s, dir) => {
      val pairs = Dedup.sharedNgramJaccardPairs(s, dir)
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a"), col("id_b"))
      val src = Tables.read(s, dir, "documents").select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")), Seq("id_a"))
        .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")), Seq("id_b"))
        .select(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // Dedup impact report (q146): corpus mass before vs after cluster
    // collapse — docs/tokens/chars pre and post, and the retained
    // fractions — the one-row summary a curation run publishes ("dedup
    // kept 96% of documents, 95% of tokens"). Survivor = the component-
    // minimum doc (q77's rule); sums run in the exact integer/decimal
    // domain and the ratios divide as identical doubles.
    "q146_dedup_impact" -> ((s, dir) => {
      val labeled = dedupClusters(s, dir)
        .select(col("doc_id"), col("cluster_id"), col("n_chars"),
          graft.operators.TextAnalytics.nTokens(col("text")).as("n_toks"))
      val pre = labeled.agg(count(lit(1)).as("docs_pre"),
        sum(col("n_toks")).as("toks_pre"), sum(col("n_chars")).as("chars_pre"))
      val post = labeled.filter(col("doc_id") === col("cluster_id"))
        .agg(count(lit(1)).as("docs_post"),
          sum(col("n_toks")).as("toks_post"), sum(col("n_chars")).as("chars_post"))
      pre.crossJoin(broadcast(post))
        .select(col("docs_pre"), col("docs_post"),
          // empty-corpus guards: null rates, never an ANSI x/0 job abort
          when(col("docs_pre") > 0,
            round(col("docs_post").cast("double") / col("docs_pre"), 6)).as("doc_keep_rate"),
          col("toks_pre"), col("toks_post"),
          when(col("toks_pre") > 0,
            round(col("toks_post").cast("double") / col("toks_pre"), 6)).as("token_keep_rate"),
          col("chars_pre"), col("chars_post"),
          when(col("chars_pre") > 0,
            round(col("chars_post").cast("double") / col("chars_pre"), 6)).as("char_keep_rate"))
    }),

    // Graph importance over the near-dup graph: PageRank picks the most
    // central document of each duplicate cluster (the canonical-survivor
    // signal that min-doc_id survivorship approximates), and ranks hub
    // documents that near-duplicate MANY others — the curation view that
    // pairwise output can't give. Top 20 by rank; isolated docs share the
    // floor rank (1-d)/N and tie-break by doc_id.
    "q107_pagerank" -> ((s, dir) => {
      val edges = Dedup.sharedNgramJaccardPairs(s, dir)
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a").as("a"), col("id_b").as("b"))
      val nodes = Tables.read(s, dir, "documents").select(col("doc_id").as("node"))
      pageRankFrom(nodes, edges)
        .select(col("node").as("doc_id"), round(col("r"), 6).as("rank"))
        .orderBy(col("rank").desc, col("doc_id"))
        .limit(20)
    }),

    // Cluster assignment for the whole corpus: transitive closure of the
    // exact near-dup pairs at J>=0.8, labeled by component minimum.
    // (q217's resolved-entity labels are session-materialized — see
    // [[sharedEntityLabels]]: a resolved entity table is a PUBLISHED silver
    // artifact in any MDM deployment, re-resolved on the ingest cadence,
    // never per query.)
    // Entity-resolution closure (q217): the q152 fuzzy-match tier promoted
    // from a pair REPORT to merged ENTITIES — the complete (un-capped)
    // blocked-levenshtein edge set collapsed by the same large-star/
    // small-star components the doc tier uses, each entity canonicalized to
    // its min-key member's name. Edit-distance matches are not transitive
    // ("brush" ~ "blush" ~ "flush" but brush !~ flush at dist 2), so the
    // closure is a DECISION the operator makes explicit (the standard MDM
    // trade: a pairwise threshold plus transitive merge); the per-entity
    // membership count is exactly what a reviewer samples to catch chains.
    // Scale: edges are the q152 blocked pairs (never all-pairs), CC is the
    // O(log² n) contraction, the rollup is entity-keyed.
    "q217_entity_clusters" -> ((s, dir) => {
      val parts = Tables.read(s, dir, "part")
        .select(col("p_partkey"), col("p_name"))
      val labels = sharedEntityLabels(s, dir)
      labels.groupBy(col("cluster_id").as("entity_id"))
        .agg(count(lit(1)).as("n_members"))
        .join(parts.select(col("p_partkey").as("entity_id"),
          col("p_name").as("canonical_name")), Seq("entity_id"))
        .select(col("entity_id"), col("n_members"), col("canonical_name"))
        .orderBy(col("entity_id"))
    }),

    // Soft-dedup loss weights (q218): instead of DROPPING near-duplicates
    // (q77's survivor selection), keep every copy and down-weight each
    // cluster member by 1/|cluster| so a duplicated document contributes
    // ONE document's worth of gradient in total — the soft alternative
    // pipelines use when near-dup members carry non-identical tails worth
    // keeping. Mass conservation is the defining invariant (Σ weights ==
    // #clusters, spec-asserted); weights ride the q76 component labels, so
    // the tier costs one size rollup + one broadcast-able join beyond the
    // shared edge layer.
    "q218_softdedup_weights" -> ((s, dir) => {
      val labeled = dedupClusters(s, dir)
        .select(col("doc_id"), col("cluster_id"))
      val sizes = labeled.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
      labeled.join(sizes, Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          round(lit(1.0) / col("cluster_size"), 6).as("weight"))
        .orderBy(col("doc_id"))
    }),

    // Quality × duplication interaction (q229): the cross-tier audit that
    // decides whether dedup and quality filtering are REDUNDANT or
    // COMPLEMENTARY on this corpus — if near-dup members concentrate in the
    // low-quality buckets, aggressive dedup already removes what the
    // quality gate would, and the pipeline can spend its filtering budget
    // elsewhere; a flat profile means the two filters prune different
    // populations and both earn their keep. Quality (q31's score) bucketed
    // on fixed 0.1-wide edges (data-independent, comparable across
    // corpora), duplication = membership in a multi-member q76 cluster.
    // One join of the label table against row-local scores + a bucket
    // rollup.
    "q229_quality_dup_interaction" -> ((s, dir) => {
      val labeled = dedupClusters(s, dir).select(col("doc_id"), col("cluster_id"))
      val sizes = labeled.groupBy(col("cluster_id")).agg(count(lit(1)).as("csz"))
      val q = Tables.read(s, dir, "documents").select(col("doc_id"),
        TextAnalytics.qualityScore.as("quality"))
      val bucket = least(floor(col("quality") * 10).cast("long"), lit(9L))
      q.join(labeled, Seq("doc_id")).join(sizes, Seq("cluster_id"))
        .select(bucket.as("bucket"),
          when(col("csz") >= 2, 1L).otherwise(0L).as("in_multi"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("in_multi")).as("n_dup"))
        .select(col("bucket"), col("n_docs"), col("n_dup"),
          round(col("n_dup").cast("double") / col("n_docs"), 6).as("dup_rate"))
        .orderBy(col("bucket"))
    }),

    "q76_dedup_clusters" -> ((s, dir) =>
      dedupClusters(s, dir)
        .select(col("doc_id"), col("cluster_id"))
        .orderBy(col("doc_id"))),

    // Community detection by synchronous label propagation (q364) — Raghavan,
    // Albert, Kumara, "Near linear time algorithm to detect community
    // structures in large-scale networks" (2007), determinized: 4 SYNCHRONOUS
    // rounds (all updates read round t−1 labels), new label = the most
    // frequent neighbor label with ties to the LOWEST label id, isolated /
    // tied-out nodes keep their label. Where connected components (q76) give
    // the coarsest partition (anything transitively linked merges), LPA
    // splits a weakly-bridged component into its dense cores — the curation
    // view that separates two template families daisy-chained by one
    // accidental pair. Fixed round count + integer counts + deterministic
    // tiebreak ⇒ fully replayable: the oracle unrolls the same 4 rounds as
    // chained CTEs. Scale: a round is ONE narrow (BIGINT,BIGINT) equi-join +
    // two map-side-combined aggregations (argmax via max(struct) — never a
    // per-node neighbor list), per-round localCheckpoint truncates lineage;
    // cost is O(rounds · |E|) shuffle rows, the LPA contract.
    "q364_label_propagation" -> ((s, dir) => {
      val edges = Dedup.sharedNgramJaccardPairs(s, dir)
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a").as("a"), col("id_b").as("b"))
      val nodes = Tables.read(s, dir, "documents").select(col("doc_id").as("node"))
      val lab = labelPropagationFrom(nodes, edges, rounds = 4).localCheckpoint()
      val sizes = lab.groupBy(col("lbl")).agg(count(lit(1)).as("community_size"))
      lab.join(sizes, "lbl")
        .select(col("node").as("doc_id"), col("lbl").as("community_id"),
          col("community_size"))
        .orderBy(col("doc_id"))
    }),

    // Partition-quality score (q365): Newman–Girvan modularity of the q76
    // near-dup partition — per community, Q_c = e_c/m − (d_c/2m)², the
    // intra-edge mass above the degree-preserving random-graph expectation.
    // THE scalar that tells a curation run whether its duplicate clusters
    // are genuinely dense groups (ΣQ_c → high) or threshold artifacts
    // daisy-chained through sparse bridges (→ 0); read next to q114's
    // clustering coefficient and q364's LPA split. Exact arithmetic end to
    // end: e_c, d_c, m are counts, each contribution is the on-grid
    // rational (4m·e_c − d_c²)/(4m²) emitted by sign-split integer half-up
    // division at 6 dp — no double product ever (the q309 negative-zero
    // class cannot strike). Scale: intra-edge counting is two narrow label
    // joins on the edge frame; degree sums are map-side-combined; m rides
    // as a broadcast one-row aggregate.
    "q365_modularity" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val e = Dedup.sharedNgramJaccardPairs(s, dir)
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a").as("u"), col("id_b").as("v"))
        .localCheckpoint() // already canonical (id_a < id_b), distinct pairs
      val labels = connectedComponents(e.select(col("u").as("a"), col("v").as("b")))
      val lu = labels.withColumnRenamed("node", "u").withColumnRenamed("cluster_id", "cu")
      val lv = labels.withColumnRenamed("node", "v").withColumnRenamed("cluster_id", "cv")
      val el = e.join(lu, Seq("u"), "left").join(lv, Seq("v"), "left")
        .select(col("u"), col("v"),
          coalesce(col("cu"), col("u")).as("cu"), coalesce(col("cv"), col("v")).as("cv"))
        .localCheckpoint()
      val intra = el.filter(col("cu") === col("cv"))
        .groupBy(col("cu").as("community_id")).agg(count(lit(1)).as("intra_edges"))
      val deg = el.select(col("u").as("node"), col("cu").as("cid"))
        .unionAll(el.select(col("v").as("node"), col("cv").as("cid")))
      val ds = deg.groupBy(col("cid").as("community_id"))
        .agg(count(lit(1)).as("degree_sum"), countDistinct(col("node")).as("n_members"))
      val m = e.agg(count(lit(1)).as("m_edges"))
      ds.join(intra, Seq("community_id"), "left")
        .crossJoin(broadcast(m))
        .select(col("community_id"), col("n_members"),
          coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
          col("degree_sum"), col("m_edges"),
          // decimal space BEFORE any product: 4·m·e_c overflows BIGINT once
          // m reaches ~10^9 edges (ANSI mode would fail loudly, but the
          // query must simply work at that scale)
          (lit(4L).cast(DecimalType(38, 0)) * col("m_edges").cast(DecimalType(38, 0))
            * coalesce(col("intra_edges"), lit(0L)).cast(DecimalType(38, 0))
            - col("degree_sum").cast(DecimalType(38, 0))
              * col("degree_sum").cast(DecimalType(38, 0))).as("num"),
          (lit(4L).cast(DecimalType(38, 0)) * col("m_edges").cast(DecimalType(38, 0))
            * col("m_edges").cast(DecimalType(38, 0))).as("den"))
        .select(col("community_id"), col("n_members"), col("intra_edges"),
          col("degree_sum"), col("m_edges"),
          // den = 4m² is 0 only on an edgeless graph (no row reaches here
          // then, but the guard keeps ANSI mode from ever seeing a /0)
          (expr("case when den = 0 then null" +
            " when num >= 0 then (2 * num * 1000000 + den) div (2 * den)" +
            " else -((2 * (- num) * 1000000 + den) div (2 * den)) end")
            .cast("double") / 1e6).as("contribution"))
        .orderBy(col("community_id"))
    }),

    // HITS hubs & authorities (q367) — Kleinberg, "Authoritative sources in
    // a hyperlinked environment" (JACM 1999) — on the customer→part bipartite
    // purchase graph: authority(part) grows with hub-ness of its buyers,
    // hub(customer) with authority of what they buy. TWO UNNORMALIZED
    // mutual-reinforcement rounds: h1 = degree, a1 = Σ h1, h2 = Σ a1,
    // a2 = Σ h2 — every score is an INTEGER path count (a2(p) = #4-step
    // alternating paths ending at p), so the iteration is exact on both
    // engines and the single end normalization a2/max(a2) is an on-grid
    // rational emitted by integer half-up division. The ranking a plain
    // sales count can't give: a part bought 50 times by single-item
    // customers outranks by count, but the HITS authority favors parts
    // bought by broad multi-category buyers — the "structurally popular"
    // signal. Scale: each round is one narrow (key, decimal) equi-join +
    // one map-side-combined sum keyed on c or p; the result is a bounded
    // top-20 TakeOrderedAndProject.
    "q367_hits" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val ed = Tables.read(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
        .join(Tables.read(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
        .localCheckpoint()
      val h1 = ed.groupBy(col("c"))
        .agg(count(lit(1)).cast(DecimalType(38, 0)).as("h1"))
      val a1 = ed.join(h1, "c").groupBy(col("p")).agg(sum(col("h1")).as("a1"))
      val h2 = ed.join(a1, "p").groupBy(col("c")).agg(sum(col("a1")).as("h2"))
      val a2 = ed.join(h2, "c").groupBy(col("p"))
        .agg(sum(col("h2")).as("a2"), count(lit(1)).as("n_buyers"))
      val mx = a2.agg(max(col("a2")).as("amax"))
      a2.crossJoin(broadcast(mx))
        .select(col("p").as("p_partkey"), col("n_buyers"),
          col("a2").cast("long").as("authority_raw"),
          (expr("(2 * a2 * 1000000 + amax) div (2 * amax)")
            .cast("double") / 1e6).as("auth_score"))
        .orderBy(col("authority_raw").desc, col("p_partkey"))
        .limit(20)
    }),

    // Cluster-safe holdout (q181): the FIX for the leakage q172 detects —
    // assign splits by hashing the near-dup CLUSTER id instead of the doc
    // id, so every member of a duplicate group lands in the same split and
    // the cross-split near-dup pair count is zero BY CONSTRUCTION (the
    // report proves it: n_cross_split_pairs rides along and must be 0).
    // Same cost as q76 + one hash column; the leak audit reuses the edge
    // set the clustering was built from.
    "q181_cluster_safe_split" -> ((s, dir) => {
      // one shingling pass: the shared materialized edge layer feeds BOTH
      // the clustering and the leak audit (recomputing the pair pipeline
      // for each would double the dominant cost); no extra checkpoint —
      // sharedNgramJaccardPairs already reads materialized rows
      val edges = Dedup.sharedNgramJaccardPairs(s, dir).filter(col("jaccard") >= 0.8)
        .select(col("id_a"), col("id_b"))
      val labels = connectedComponents(
        edges.select(col("id_a").as("a"), col("id_b").as("b")))
      val b = expr("cast(conv(substring(md5(concat(cast(cluster_id as string), " +
        "':split')), 1, 4), 16, 10) as bigint) % 100")
      val sp = Tables.read(s, dir, "documents").select(col("doc_id"))
        .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
        .withColumn("split",
          when(b < 80, lit("train")).when(b < 90, lit("val")).otherwise(lit("test")))
      val leaks = edges
        .join(sp.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
        .join(sp.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
        .agg(coalesce(sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)), lit(0L))
          .as("n_cross_split_pairs"))
      sp.agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train_docs"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val_docs"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test_docs"))
        .crossJoin(leaks)
    }),

    // Canonical selection (q182): within each multi-member near-dup
    // cluster, keep the LONGEST member (token count, doc_id tiebreak) —
    // the quality-aware survivor rule curation actually wants, vs q77's
    // positional minimum. Selection is the one-pass min(struct) argmax,
    // never a collect or a per-cluster sort.
    "q182_canonical_selection" -> ((s, dir) => {
      val m = dedupClusters(s, dir)
        .select(col("cluster_id"), col("doc_id"),
          size(split(trim(col("text")), " ")).cast("long").as("n_toks"))
      val surv = m
        .select(col("cluster_id"),
          struct((-col("n_toks")).as("negt"), col("doc_id").as("d")).as("sel"))
        .groupBy(col("cluster_id")).agg(min(col("sel")).as("mn"))
        .select(col("cluster_id"), col("mn.d").as("survivor_id"),
          (-col("mn.negt")).as("survivor_toks"))
      m.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_members"))
        .filter(col("n_members") > 1)
        .join(surv, "cluster_id")
        .select(col("cluster_id"), col("n_members"),
          col("survivor_id"), col("survivor_toks"))
        .orderBy(col("cluster_id"))
    }),

    // The deduplicated corpus: one survivor (the component-minimum doc) per
    // cluster, reported per source — docs kept / dropped and surviving
    // character volume, the numbers a curation run reports after collapse.
    "q77_cluster_survivors" -> ((s, dir) =>
      dedupClusters(s, dir)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") === col("cluster_id"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("doc_id") === col("cluster_id"), col("n_chars"))
            .otherwise(0L)).as("chars_kept"))
        .orderBy(col("source"))),

    // Duplicate-mass report: how many clusters exist at each size — the
    // histogram a curation run publishes ("N singletons, M pairs, one
    // 12-way pile-up"). Two cheap aggregations over the label table.
    "q84_cluster_sizes" -> ((s, dir) =>
      dedupClusters(s, dir)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))
        .select(col("sz").as("cluster_size"), col("n_clusters"))
        .orderBy(col("cluster_size")))
  )

  /** Shared oracle prefix: q35's shingle/pair pipeline → canonical near-dup
    * `edges` at J>=0.8. Reused by the component oracles (below) and the
    * PageRank oracle (which iterates over the same edge set). */
  private val edgeCte: String =
    """WITH RECURSIVE
      |toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(range(len(w) - 4),
      |         i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5])) AS shingles
      |       FROM toks WHERE len(w) >= 5),
      |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
      |capped AS (SELECT s FROM ex GROUP BY s HAVING count(*) BETWEEN 2 AND 8192),
      |common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
      |           FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      |           WHERE a.s IN (SELECT s FROM capped)
      |           GROUP BY 1, 2),
      |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
      |edges AS (SELECT id_a AS u, id_b AS v FROM common
      |            JOIN sizes sa ON sa.doc_id = id_a
      |            JOIN sizes sb ON sb.doc_id = id_b
      |          WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) >= 0.8)""".stripMargin

  /** [[edgeCte]] extended with a recursive-CTE transitive closure →
    * component minimum per doc. DuckDB's recursive UNION computes the
    * closure exactly; at audit scale (sf0.01) the edge set is tiny, so
    * closure cost is irrelevant — the point is bit-exact cluster labels
    * against the Spark star-contraction. */
  private[operators] val clusterCte: String = edgeCte +
    """,
      |sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
      |reach(u, v) AS (SELECT u, v FROM sym
      |                UNION
      |                SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
      |lbl AS (SELECT u AS doc_id, min(v) AS mn FROM reach GROUP BY u),
      |clusters AS (
      |  SELECT d.doc_id, d.source, d.n_chars,
      |         CAST(least(d.doc_id, coalesce(l.mn, d.doc_id)) AS BIGINT) AS cluster_id
      |  FROM documents d LEFT JOIN lbl l ON l.doc_id = d.doc_id)""".stripMargin

  /** q107 oracle: [[edgeCte]]'s near-dup edges, then the PageRank
    * recurrence unrolled as 6 chained CTEs — the same arithmetic
    * (`(1 - 0.85) / n + 0.85 * Σ r/deg`) the Spark loop computes, so the
    * iterated doubles agree to the last few ulps and round(6) compares
    * exactly. */
  private val pageRankOracle: String = {
    val iterCtes = (1 to 6).map { i =>
      s"""r$i AS (SELECT d.doc_id AS node,
         |        (1 - 0.85) / nn.n + 0.85 * coalesce(sum(r${i - 1}.r / pdeg.deg), 0) AS r
         |        FROM documents d CROSS JOIN nn
         |        LEFT JOIN psym ON psym.dst = d.doc_id
         |        LEFT JOIN pdeg ON pdeg.src = psym.src
         |        LEFT JOIN r${i - 1} ON r${i - 1}.node = psym.src
         |        GROUP BY d.doc_id, nn.n)""".stripMargin
    }.mkString(",\n")
    edgeCte +
      s""",
         |psym AS (SELECT u AS src, v AS dst FROM edges UNION ALL SELECT v AS src, u AS dst FROM edges),
         |pdeg AS (SELECT src, count(*) AS deg FROM psym GROUP BY 1),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
         |r0 AS (SELECT doc_id AS node, 1.0 / nn.n AS r FROM documents CROSS JOIN nn),
         |$iterCtes
         |SELECT node AS doc_id, round(r, 6) AS rank FROM r6
         |ORDER BY rank DESC, doc_id LIMIT 20""".stripMargin
  }

  /** q364 oracle: [[edgeCte]]'s near-dup edges, then the synchronous LPA
    * recurrence unrolled as 4 chained CTE rounds — per round, the
    * (node, neighbor-label) counts, the row_number argmax (count desc,
    * label asc — the Spark max(struct) tiebreak verbatim), and the
    * keep-if-no-update coalesce. */
  private val lpaOracle: String = {
    val roundCtes = (1 to 4).map { i =>
      s"""n$i AS (SELECT s.dst AS node, p.lbl, count(*) AS c
         |        FROM sym s JOIN l${i - 1} p ON p.node = s.src GROUP BY 1, 2),
         |b$i AS (SELECT node, lbl FROM (
         |          SELECT node, lbl,
         |                 row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
         |          FROM n$i) WHERE rn = 1),
         |l$i AS (SELECT p.node, coalesce(b.lbl, p.lbl) AS lbl
         |        FROM l${i - 1} p LEFT JOIN b$i b ON b.node = p.node)""".stripMargin
    }.mkString(",\n")
    edgeCte +
      s""",
         |sym AS (SELECT u AS src, v AS dst FROM edges UNION ALL SELECT v AS src, u AS dst FROM edges),
         |l0 AS (SELECT doc_id AS node, doc_id AS lbl FROM documents),
         |$roundCtes,
         |g AS (SELECT lbl, count(*) AS n FROM l4 GROUP BY 1)
         |SELECT l.node AS doc_id, CAST(l.lbl AS BIGINT) AS community_id,
         |       CAST(g.n AS BIGINT) AS community_size
         |FROM l4 l JOIN g ON g.lbl = l.lbl ORDER BY doc_id""".stripMargin
  }

  /** q365 oracle: [[clusterCte]]'s component labels + the exact modularity
    * contributions — counts only, sign-split integer half-up at 6 dp (the
    * Spark expression's operand sequence verbatim, `//` for `div`). */
  private val modularityOracle: String = clusterCte +
    """,
      |m AS (SELECT count(*) AS m_edges FROM edges),
      |endp AS (SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges),
      |cl AS (SELECT doc_id, cluster_id FROM clusters),
      |ei AS (SELECT a.cluster_id AS community_id, count(*) AS intra_edges
      |       FROM edges e JOIN cl a ON a.doc_id = e.u JOIN cl b ON b.doc_id = e.v
      |       WHERE a.cluster_id = b.cluster_id GROUP BY 1),
      |ds AS (SELECT cl.cluster_id AS community_id,
      |         CAST(count(*) AS BIGINT) AS degree_sum,
      |         CAST(count(DISTINCT endp.node) AS BIGINT) AS n_members
      |       FROM endp JOIN cl ON cl.doc_id = endp.node GROUP BY 1),
      |x AS (SELECT ds.community_id, ds.n_members,
      |        CAST(coalesce(ei.intra_edges, 0) AS BIGINT) AS intra_edges,
      |        ds.degree_sum, CAST(m.m_edges AS BIGINT) AS m_edges,
      |        CAST(4 * m.m_edges * coalesce(ei.intra_edges, 0)
      |             - ds.degree_sum * ds.degree_sum AS HUGEINT) AS num,
      |        CAST(4 * m.m_edges * m.m_edges AS HUGEINT) AS den
      |      FROM ds CROSS JOIN m LEFT JOIN ei ON ei.community_id = ds.community_id)
      |SELECT community_id, n_members, intra_edges, degree_sum, m_edges,
      |       CAST(CASE WHEN num >= 0 THEN (2 * num * 1000000 + den) // (2 * den)
      |                 ELSE -((2 * (- num) * 1000000 + den) // (2 * den)) END AS DOUBLE)
      |         / 1e6 AS contribution
      |FROM x ORDER BY community_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q364_label_propagation" -> lpaOracle,
    "q365_modularity" -> modularityOracle,
    "q367_hits" ->
      """WITH ed AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        |            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |h1 AS (SELECT c, CAST(count(*) AS HUGEINT) AS h1 FROM ed GROUP BY 1),
        |a1 AS (SELECT p, sum(h1.h1) AS a1 FROM ed JOIN h1 USING (c) GROUP BY 1),
        |h2 AS (SELECT c, sum(a1.a1) AS h2 FROM ed JOIN a1 USING (p) GROUP BY 1),
        |a2 AS (SELECT p, sum(h2.h2) AS a2, count(*) AS n_buyers
        |       FROM ed JOIN h2 USING (c) GROUP BY 1),
        |mx AS (SELECT max(a2) AS amax FROM a2)
        |SELECT p AS p_partkey, CAST(n_buyers AS BIGINT) AS n_buyers,
        |       CAST(a2 AS BIGINT) AS authority_raw,
        |       CAST((2 * a2 * 1000000 + amax) // (2 * amax) AS DOUBLE) / 1e6 AS auth_score
        |FROM a2 CROSS JOIN mx
        |ORDER BY authority_raw DESC, p_partkey LIMIT 20""".stripMargin,
    "q217_entity_clusters" ->
      """WITH RECURSIVE
        |p AS (SELECT p_partkey, p_name,
        |        string_split(p_name, ' ')[1] || ' ' || string_split(p_name, ' ')[2] AS blk
        |      FROM part),
        |ok AS (SELECT blk FROM p GROUP BY blk HAVING count(*) <= 1000),
        |c AS (SELECT p.* FROM p JOIN ok USING (blk)),
        |e2 AS (SELECT a.p_partkey AS u, b.p_partkey AS v
        |       FROM c a JOIN c b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
        |       WHERE levenshtein(a.p_name, b.p_name) <= 2),
        |sym AS (SELECT u, v FROM e2 UNION SELECT v, u FROM e2),
        |reach(u, v) AS (SELECT u, v FROM sym
        |                UNION
        |                SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
        |lbl AS (SELECT u AS node, least(u, min(v)) AS entity_id FROM reach GROUP BY u),
        |g AS (SELECT entity_id, count(*) AS n_members FROM lbl GROUP BY 1)
        |SELECT g.entity_id, g.n_members, pp.p_name AS canonical_name
        |FROM g JOIN part pp ON pp.p_partkey = g.entity_id
        |ORDER BY entity_id""".stripMargin,
    "q107_pagerank" -> pageRankOracle,
    "q76_dedup_clusters" ->
      (clusterCte + "\nSELECT doc_id, cluster_id FROM clusters ORDER BY doc_id"),
    "q229_quality_dup_interaction" ->
      (clusterCte +
        """,
          |sz AS (SELECT cluster_id, count(*) AS csz FROM clusters GROUP BY 1),
          |q AS (SELECT doc_id,
          |        round(0.5 * least(1.0, length(text) / 500.0)
          |            + 0.3 * (CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to|is)\b')) AS DOUBLE) /
          |                     len(string_split(trim(text), ' ')))
          |            + 0.2 * (1.0 - CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) /
          |                     length(text)), 6) AS quality
          |      FROM documents),
          |b AS (SELECT least(CAST(floor(quality * 10) AS BIGINT), 9) AS bucket,
          |        CASE WHEN sz.csz >= 2 THEN 1 ELSE 0 END AS in_multi
          |      FROM q JOIN clusters c ON c.doc_id = q.doc_id
          |      JOIN sz ON sz.cluster_id = c.cluster_id)
          |SELECT bucket, count(*) AS n_docs, CAST(sum(in_multi) AS BIGINT) AS n_dup,
          |       round(CAST(sum(in_multi) AS DOUBLE) / count(*), 6) AS dup_rate
          |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin),
    "q218_softdedup_weights" ->
      (clusterCte +
        """,
          |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM clusters GROUP BY 1)
          |SELECT c.doc_id, c.cluster_id, sz.cluster_size,
          |       round(1.0 / sz.cluster_size, 6) AS weight
          |FROM clusters c JOIN sz USING (cluster_id) ORDER BY doc_id""".stripMargin),
    "q181_cluster_safe_split" ->
      (clusterCte +
        """,
          |sp AS (SELECT doc_id,
          |         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
          |              ELSE 'test' END AS split
          |       FROM (SELECT doc_id,
          |               CAST(concat('0x', substring(md5(CAST(cluster_id AS VARCHAR) || ':split'), 1, 4)) AS BIGINT) % 100 AS b
          |             FROM clusters)),
          |lk AS (SELECT COALESCE(CAST(sum(CASE WHEN a.split != b.split THEN 1 ELSE 0 END) AS BIGINT), 0)
          |         AS n_cross_split_pairs
          |       FROM edges e JOIN sp a ON a.doc_id = e.u JOIN sp b ON b.doc_id = e.v)
          |SELECT (SELECT CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) FROM sp) AS n_train_docs,
          |       (SELECT CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) FROM sp) AS n_val_docs,
          |       (SELECT CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) FROM sp) AS n_test_docs,
          |       n_cross_split_pairs
          |FROM lk""".stripMargin),
    "q182_canonical_selection" ->
      (clusterCte +
        """,
          |m AS (SELECT c.cluster_id, c.doc_id,
          |        CAST(len(string_split(trim(d.text), ' ')) AS BIGINT) AS n_toks
          |      FROM clusters c JOIN documents d ON d.doc_id = c.doc_id),
          |surv AS (SELECT cluster_id, doc_id AS survivor_id, n_toks AS survivor_toks
          |         FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
          |                         ORDER BY n_toks DESC, doc_id) AS rn FROM m)
          |         WHERE rn = 1),
          |sz AS (SELECT cluster_id, count(*) AS n_members FROM m GROUP BY 1)
          |SELECT sz.cluster_id, sz.n_members, surv.survivor_id, surv.survivor_toks
          |FROM sz JOIN surv USING (cluster_id)
          |WHERE sz.n_members > 1
          |ORDER BY cluster_id""".stripMargin),
    "q146_dedup_impact" ->
      (clusterCte +
        """,
          |lab AS (SELECT c.doc_id, c.cluster_id, c.n_chars,
          |               len(string_split(trim(d.text), ' ')) AS n_toks
          |        FROM clusters c JOIN documents d ON d.doc_id = c.doc_id),
          |pre AS (SELECT count(*) AS docs_pre, CAST(sum(n_toks) AS BIGINT) AS toks_pre,
          |               CAST(sum(n_chars) AS BIGINT) AS chars_pre FROM lab),
          |post AS (SELECT count(*) AS docs_post, CAST(sum(n_toks) AS BIGINT) AS toks_post,
          |                CAST(sum(n_chars) AS BIGINT) AS chars_post
          |         FROM lab WHERE doc_id = cluster_id)
          |SELECT docs_pre, docs_post,
          |       CASE WHEN docs_pre > 0 THEN round(CAST(docs_post AS DOUBLE) / docs_pre, 6) END AS doc_keep_rate,
          |       toks_pre, toks_post,
          |       CASE WHEN toks_pre > 0 THEN round(CAST(toks_post AS DOUBLE) / toks_pre, 6) END AS token_keep_rate,
          |       chars_pre, chars_post,
          |       CASE WHEN chars_pre > 0 THEN round(CAST(chars_post AS DOUBLE) / chars_pre, 6) END AS char_keep_rate
          |FROM pre CROSS JOIN post""".stripMargin),
    "q125_cross_source_dups" ->
      (edgeCte +
        """
          |SELECT least(da.source, db.source) AS source_a,
          |       greatest(da.source, db.source) AS source_b,
          |       count(*) AS n_pairs
          |FROM edges
          |  JOIN documents da ON da.doc_id = edges.u
          |  JOIN documents db ON db.doc_id = edges.v
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "q114_triangle_census" ->
      (edgeCte +
        """,
          |tri AS (SELECT count(*) AS n_triangles
          |        FROM edges e1 JOIN edges e2 ON e2.u = e1.v
          |             JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
          |deg AS (SELECT n, count(*) AS d FROM
          |          (SELECT u AS n FROM edges UNION ALL SELECT v AS n FROM edges)
          |        GROUP BY n),
          |wdg AS (SELECT COALESCE(CAST(sum(d * (d - 1)) / 2 AS BIGINT), 0) AS n_wedges FROM deg),
          |ecnt AS (SELECT count(*) AS n_edges FROM edges)
          |SELECT n_edges, n_triangles, n_wedges,
          |       round(CASE WHEN n_wedges = 0 THEN 0.0
          |                  ELSE 3.0 * n_triangles / n_wedges END, 6) AS global_cc
          |FROM ecnt CROSS JOIN tri CROSS JOIN wdg""".stripMargin),
    "q77_cluster_survivors" ->
      (clusterCte +
        """
          |SELECT source, count(*) AS n_docs,
          |       CAST(sum(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          |       CAST(sum(CASE WHEN doc_id = cluster_id THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept
          |FROM clusters GROUP BY source ORDER BY source""".stripMargin),
    "q84_cluster_sizes" ->
      (clusterCte +
        """,
          |sz AS (SELECT cluster_id, count(*) AS sz FROM clusters GROUP BY cluster_id)
          |SELECT sz AS cluster_size, count(*) AS n_clusters
          |FROM sz GROUP BY sz ORDER BY cluster_size""".stripMargin)
  )
}
