package graft

import graft.operators.{Dedup, EventAnalytics, Retrieval, Similarity, Tokenizer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Degenerate-input behavior: operators must return empty/identity results
  * on empty or undersized inputs, never throw — the property that matters
  * when a 100 TB pipeline hits an empty partition, a source with no
  * matches, or a first-run corpus smaller than the algorithm's parameters. */
class EdgeCasesSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("heavy hitters on an empty corpus: empty result, no division blowup") {
    Tokenizer.heavyHitters(emptyDocs).count() shouldBe 0L
  }

  test("entity closure on a corpus with no fuzzy matches is empty, not an error") {
    // wildly distinct names: no blocked pair survives dist <= 2, so the
    // edge set is empty and connected components must degrade to nothing
    val parts = Seq((1L, "aardvark xylophone unique"),
      (2L, "brontosaurus quantum rail"), (3L, "chrysanthemum velvet ox"))
      .toDF("p_partkey", "p_name")
    val edges = Dedup.fuzzyPairsAllFrom(parts)
      .select(col("key_a").as("a"), col("key_b").as("b"))
    edges.count() shouldBe 0L
    graft.operators.Cluster.connectedComponents(edges).count() shouldBe 0L
  }

  test("soft-dedup weights on an all-singleton corpus are all exactly 1.0") {
    // no near-dup pairs → every cluster is a singleton → weight 1/1
    val rows = SparkEntry.queries("q218_softdedup_weights")(spark, TestSpark.sf0001)
      .filter(col("cluster_size") === 1).limit(5).collect()
    rows.foreach(_.getAs[Double]("weight") shouldBe 1.0)
  }

  test("fuzzy match handles 1-token, multi-space, empty and identical names; prefix strip stays exact") {
    // adversarial blocking-key shapes: single-token names (blk == name,
    // empty suffix), consecutive spaces (split keeps empty tokens),
    // empty names, exact duplicates, and a cross-block near-miss
    val parts = Seq(
      (1L, "alpha"), (2L, "alphq"), (3L, "alpha"),          // 1-token block
      (4L, "a  b tail"), (5L, "a  b tails"),                // double-space block
      (6L, ""), (7L, ""),                                   // empty names
      (8L, "zed one two"), (9L, "zed one twq"),             // normal block
      (10L, "completely different name")                    // loner
    ).toDF("p_partkey", "p_name")
    val got = Dedup.fuzzyMatchPairsFrom(parts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // naive full-string blocked kernel — the ground truth the optimized
    // (prefix-stripped, length-prefiltered) kernel must reproduce exactly
    val p = parts.select(col("p_partkey"), col("p_name"),
      concat_ws(" ", slice(split(col("p_name"), " "), 1, 2)).as("blk"))
    val naive = p.as("a").join(p.as("b"),
        col("a.blk") === col("b.blk") && col("a.p_partkey") < col("b.p_partkey"))
      .select(col("a.p_partkey").as("key_a"), col("b.p_partkey").as("key_b"),
        levenshtein(col("a.p_name"), col("b.p_name")).as("dist"))
      .filter(col("dist") <= 2)
      .orderBy(col("dist"), col("key_a"), col("key_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    got shouldBe naive
    // sanity on content: identical names at dist 0, the planted typos at 1
    got should contain((1L, 3L, 0))
    got should contain((6L, 7L, 0))
    got should contain((8L, 9L, 1))
    got should contain((4L, 5L, 1))
    // documented blocking limitation: a typo INSIDE the 2-token blocking
    // key ("alpha" vs "alphq" — 1-token names ARE their own key) lands the
    // pair in different blocks, so blocked matching never compares them
    got.map(t => (t._1, t._2)) should not contain ((1L, 2L))
  }

  test("zipf and heaps fits on an empty corpus return a single all-null/zero row") {
    // the aggregation still emits its one row; n = 0 and the fit columns
    // are null (0/0) — callers read n before trusting the fit
    val z = Tokenizer.zipfSlopeFrom(emptyDocs).head()
    z.getLong(0) shouldBe 0L
    val h = Tokenizer.heapsFitFrom(emptyDocs).head()
    h.getLong(0) shouldBe 0L
  }

  test("phrase search with an absent phrase or empty corpus is empty") {
    Retrieval.phraseSearch(emptyDocs, Seq("a", "b")).count() shouldBe 0L
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    Retrieval.phraseSearch(docs, Seq("a", "b")).count() shouldBe 0L
  }

  test("k-means with fewer vectors than k converges on the vectors present") {
    val vecs = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(1.0, 1.0)), (2L, Array(5.0, 5.0))
    ).toDF("vec_id", "v")
    val out = Similarity.kmeansRefine(vecs, k = 8, iters = 2).collect()
    out.length shouldBe 3                      // every vector still assigned
    out.foreach(r => r.getDouble(2) shouldBe 0.0 +- 1e-9) // own singleton cell
  }

  test("jaccard pairs and histogram on single-doc / short-doc corpora are empty") {
    val single = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    Dedup.ngramJaccardPairsFrom(single).count() shouldBe 0L
    // documents shorter than the shingle width produce no shingles at all
    val short = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    Dedup.ngramJaccardPairsFrom(short).count() shouldBe 0L
  }

  test("conformal tau on a tiny calibration slice clamps k to 1 instead of emptying") {
    // doc_id < 7 leaves exactly one calibration doc (doc_id 0): n_cal = 1,
    // k = floor(0.1 * 2) = 0 — unclamped, the rank filter matches nothing
    // and the scalar fetch throws; clamped, tau degrades to the min score
    val dir = java.nio.file.Files.createTempDirectory("graft-tiny-cal")
      .toFile.getAbsolutePath
    graft.sources.Tables.read(spark, TestSpark.sf0001, "documents")
      .filter(col("doc_id") < 7)
      .write.parquet(s"$dir/documents.parquet")
    val tau = graft.operators.Expectations.conformalTau(spark, dir)
    val minQ = graft.sources.Tables.read(spark, dir, "documents")
      .filter(col("doc_id") % 7 === 0)
      .agg(min(graft.operators.TextAnalytics.qualityScore)).head.getDouble(0)
    tau shouldBe minQ
  }

  test("label propagation on an edgeless graph is the identity labeling") {
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    val lab = operators.Cluster.labelPropagationFrom(nodes, edges, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    lab shouldBe Map(1L -> 1L, 2L -> 2L, 3L -> 3L)
  }

  test("label propagation on a 2-cycle-prone bipartite square is deterministic across runs") {
    // synchronous LPA famously oscillates on bipartite structure; the fixed
    // round count + min-label tiebreak must make the OUTPUT deterministic
    // regardless — two runs, identical labels
    val nodes = (1L to 4L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    def run() = operators.Cluster.labelPropagationFrom(nodes, edges, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    run() shouldBe run()
  }

  test("deadline funnel with zero qualifying users reports zeros, not an error") {
    import java.sql.Timestamp
    val events = Seq((1L, "click", new Timestamp(1000L)))
      .toDF("user_id", "event_type", "ts")
    val r = EventAnalytics.deadlineFunnel(events).head()
    r.getLong(0) shouldBe 0L   // nobody viewed
    r.getLong(1) shouldBe 0L
    r.getLong(2) shouldBe 0L
    // rates are null (0/0) rather than a crash; callers gate on the counts
    r.isNullAt(3) shouldBe true
  }
}
