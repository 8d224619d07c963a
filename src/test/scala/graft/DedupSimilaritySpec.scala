package graft

import graft.operators.{Dedup, Similarity}
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Quality bars for the approximate operators (MinHash-LSH, SimHash, ANN):
  * the driver's DuckDB oracle hash-verifies their registered pipelines, but
  * only these specs prove the APPROXIMATION is any good — recall floors,
  * monotonicity, and no-false-positive guarantees against the exact
  * counterparts on the sf0.001 fixtures, including the Lloyd's-trained
  * model paths that the registry serves seeded variants of. */
class DedupSimilaritySpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  test("MinHash-LSH recalls the exact near-duplicate pairs at J >= 0.8") {
    val exact = Dedup.ngramJaccardPairs(spark, sf0001)
      .filter(col("jaccard") >= 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(spark, sf0001, 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    exact should not be empty // fixtures plant near-dups
    // every LSH pair is exact-verified, so no false positives by construction
    lsh.subsetOf(exact) shouldBe true
    // recall: b=8, r=4 bands catch J>=0.8 with p≈0.985 each
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    recall should be >= 0.8
  }

  test("deployment probe shape: a single-band read of the persisted LSH index is partition-pruned and exact") {
    // The q200/q388 admission probe at deployment reads the PERSISTED band
    // index (q389's layer), not a re-banding of the corpus; with the index
    // hive-layouted by band_id, a per-band probe must (a) return exactly
    // that band's rows and (b) physically scan ONLY that band's files —
    // the end-to-end fixture-data form of VersionedLayerSpec's synthetic
    // pruning pin.
    import graft.sources.{Tables, TempRoots, VersionedLayer}
    val rootPath = java.nio.file.Files.createTempDirectory("graft_probe_layout")
    try {
      val idx = Dedup.lshIndexRows(Tables.read(spark, sf0001, "documents"))
        .localCheckpoint()
      VersionedLayer.write(idx, rootPath.toString, layoutBy = Seq("band_id"))
      val probe = VersionedLayer.readPartitions(spark, rootPath.toString,
        Map("band_id" -> "5"))
      val got = probe.collect().map(r => (r.getLong(0), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      val want = idx.filter(col("band_id") === 5).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toSet
      got shouldBe want
      want should not be empty
      val files = probe.inputFiles.toSeq
      files should not be empty
      files.foreach(_ should include("band_id=5"))
    } finally TempRoots.deleteRecursively(rootPath, swallow = true)
  }

  test("SimHash: near-duplicate docs collide or nearly collide in hamming space") {
    val top = Dedup.ngramJaccardPairs(spark, sf0001)
      .orderBy(col("jaccard").desc).limit(5).collect()
    val sims = SparkEntry.queries("q37_simhash")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    for (r <- top) {
      val d = hamming(sims(r.getLong(0)), sims(r.getLong(1)))
      d should be <= 12 // 64-bit simhash of ~98%-overlapping docs
    }
  }

  test("ANN results are true cosine scores and overlap the exact top-k") {
    val e = graft.sources.Tables.read(spark, sf0001, "embeddings")
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
    val exactTop = Similarity.cosineTopK(e.filter(col("vec_id") < 3), e, 20)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // registered paths (q40 = seeded quantizer) plus the Lloyd's-TRAINED
    // IVF perf path, which is no longer registry-reachable but must keep
    // its recall bar
    val results = Seq("q39_ann_lsh", "q40_ann_ivf")
      .map(q => q -> SparkEntry.queries(q)(spark, sf0001).collect()) :+
      ("annIvf(trained)" -> Similarity.annIvf(spark, sf0001, 5).collect())
    for ((name, ann) <- results) {
      withClue(name) {
        ann should not be empty
        ann.foreach { r =>
          val sim = r.getDouble(3)
          sim should (be >= -1.000001 and be <= 1.000001)
        }
        // approximate, but not random: some neighbors appear in the exact top-20
        val hits = ann.map(r => (r.getLong(0), r.getLong(2))).count(exactTop.contains)
        hits should be >= 1
      }
    }
  }

  test("fuzzy match: prefix-strip + length prefilter are output-invariant vs full-name levenshtein") {
    // the optimized kernel (common-prefix strip, |Δlen| prefilter, banded
    // DP) must emit EXACTLY the naive blocked full-string result — the
    // invariants the q152 oracle relies on
    val p = graft.sources.Tables.read(spark, sf0001, "part")
      .select(col("p_partkey"), col("p_name"),
        concat_ws(" ", slice(split(col("p_name"), " "), 1, 2)).as("blk"))
    val a = p.select(col("blk"), col("p_partkey").as("key_a"), col("p_name").as("name_a"))
    val b = p.select(col("blk"), col("p_partkey").as("key_b"), col("p_name").as("name_b"))
    val naive = a.join(b, "blk")
      .filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"),
        levenshtein(col("name_a"), col("name_b")).as("dist"))
      .filter(col("dist") <= 2)
      .orderBy(col("dist"), col("key_a"), col("key_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val opt = Dedup.fuzzyMatchPairs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    naive.length should be <= 1000 // else the limit truncates and sets differ
    opt shouldBe naive
  }

  test("session model layer: cached ANN models are identical to fresh training and are trained once") {
    // cached-vs-fresh equality (training is deterministic, so the memoized
    // model can never change a result) ...
    val e = graft.sources.Tables.read(spark, sf0001, "embeddings")
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
    val fresh = Similarity.trainCentroids(e, 8, 3)
    val shared = Similarity.sharedCentroids(spark, sf0001, 8, 3)
    shared.flatten.toSeq shouldBe fresh.flatten.toSeq
    val freshBooks = Similarity.trainPqCodebooks(e, 8, 32, 2)
    val sharedBooks = Similarity.sharedPqBooks(spark, sf0001, 8, 32, 2)
    sharedBooks.flatten.flatten.toSeq shouldBe freshBooks.flatten.flatten.toSeq
    // ... and the second shared call is the SAME model instance — the
    // train-once contract that makes repeated q40/q108-style probes cheap
    (Similarity.sharedCentroids(spark, sf0001, 8, 3) eq shared) shouldBe true
    (Similarity.sharedPqBooks(spark, sf0001, 8, 32, 2) eq sharedBooks) shouldBe true
  }

  test("noEdgeCache bypass recomputes the seeded ANN pipelines with identical results") {
    // ScaleCheck's contract: -Dgraft.noEdgeCache=1 must time the REAL
    // pipeline (no checkpointed codes/models) and change nothing else
    val cachedIvf = Similarity.annIvfSeeded(spark, sf0001, 5).collect().map(_.toSeq).toSeq
    val cachedPq = Similarity.annPqAdcSeeded(spark, sf0001, 5).collect().map(_.toSeq).toSeq
    sys.props("graft.noEdgeCache") = "1"
    try {
      Similarity.annIvfSeeded(spark, sf0001, 5).collect().map(_.toSeq).toSeq shouldBe cachedIvf
      Similarity.annPqAdcSeeded(spark, sf0001, 5).collect().map(_.toSeq).toSeq shouldBe cachedPq
    } finally sys.props.remove("graft.noEdgeCache")
    // and no ANN probe ever degenerates to an unbucketed cartesian
    for (q <- Seq("q39_ann_lsh", "q40_ann_ivf", "q108_pq_adc")) {
      val plan = SparkEntry.queries(q)(spark, sf0001).queryExecution.executedPlan.toString
      withClue(q)(plan should not include "CartesianProduct")
    }
  }

  test("multi-probe LSH recall dominates single-probe against the exact top-k") {
    val e = graft.sources.Tables.read(spark, sf0001, "embeddings")
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
    val exactTop = Similarity.cosineTopK(e.filter(col("vec_id") < 3), e, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // 4 planes on the tiny corpus: 16 buckets, so both probe modes have
    // non-degenerate bucket populations to differ on (at 8 planes the
    // fixture's 50 vectors are ~all singletons and both recalls are 0)
    def recallOf(multiProbe: Boolean): Double = {
      val ann = Similarity.annLsh(spark, sf0001, 5, nPlanes = 4, multiProbe = multiProbe)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (ann & exactTop).size.toDouble / exactTop.size
    }
    val single = recallOf(multiProbe = false)
    val multi = recallOf(multiProbe = true)
    info(f"single-probe recall=$single%.3f multi-probe recall=$multi%.3f")
    multi should be > single  // bit-flip probes strictly recover more here
    multi should be >= 0.3    // absolute floor (measured 0.333)
    // the probe fan-out must stay on the broadcast side: corpus hashed once
    val plan = Similarity.annLsh(spark, sf0001, 5).queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("IVF training: Lloyd's iterations never increase quantization cost; cells partition the corpus") {
    val e = graft.sources.Tables.read(spark, sf0001, "embeddings")
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
    def cost(cents: Array[Array[Double]]): Double = {
      // total squared-L2 distance of every vector to its assigned centroid
      val lits = cents.map(c => array(c.map(lit).toIndexedSeq: _*))
      e.select(lits.map(cl =>
          aggregate(zip_with(col("v"), cl, (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, x) => acc + x))
        .reduce(least(_, _)).as("d"))
        .agg(sum(col("d"))).collect()(0).getDouble(0)
    }
    val seeds = Similarity.trainCentroids(e, k = 4, iters = 0)
    val costs = (0 to 3).map(i => cost(Similarity.trainCentroids(e, k = 4, iters = i)))
    // Lloyd's monotonicity: assignment(argmin) + mean update never increases
    // the objective; training must beat (or match) the raw seeds
    costs.sliding(2).foreach { case Seq(a, b) => b should be <= a + 1e-9 }
    costs.last should be < cost(seeds) + 1e-9
    // the quantizer partitions: every vector lands in exactly one cell 0..k-1
    val trained = Similarity.trainCentroids(e, k = 4, iters = 3)
    val cells = e.select(Similarity.cellOf(spark, col("v"), trained).as("cell"))
      .groupBy(col("cell")).count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    cells.keySet.forall(c => c >= 0 && c < 4) shouldBe true
    cells.values.sum shouldBe e.count()
  }

  test("PQ: codebooks are deterministic, codes partition, Lloyd's never increases cost") {
    val e = graft.sources.Tables.read(spark, sf0001, "embeddings")
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
    val books = Similarity.trainPqCodebooks(e, m = 4, ks = 16, iters = 2)
    books.length shouldBe 4
    books.foreach { bk => bk.length shouldBe 16; bk.foreach(_.length shouldBe 16) }
    // deterministic retrain: identical codebooks bit-for-bit
    val books2 = Similarity.trainPqCodebooks(e, m = 4, ks = 16, iters = 2)
    books.flatten.flatten.toSeq shouldBe books2.flatten.flatten.toSeq
    // codes in range, one per subspace
    val codes = Similarity.pqCodes(e, books).collect()
    codes.length shouldBe e.count()
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      cs.length shouldBe 4
      cs.foreach(c => c should (be >= 0 and be < 16))
    }
    // per-subspace quantization cost is non-increasing over Lloyd's rounds
    def cost(bks: Array[Array[Array[Double]]]): Double = {
      val per = (0 until 4).map { b =>
        val sv = slice(col("v"), b * 16 + 1, 16)
        bks(b).map(c => aggregate(
            zip_with(sv, array(c.map(lit).toIndexedSeq: _*), (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, x) => acc + x))
          .reduce(least(_, _))
      }.reduce(_ + _)
      e.select(per.as("d")).agg(sum(col("d"))).head.getDouble(0)
    }
    val costs = (0 to 2).map(i => cost(Similarity.trainPqCodebooks(e, m = 4, ks = 16, iters = i)))
    costs.sliding(2).foreach { case Seq(a, b) => b should be <= a + 1e-9; case _ => () }
  }

  test("PQ-ADC + exact re-rank recalls the exact L2 top-k") {
    val e = graft.sources.Tables.read(spark, sf0001, "embeddings")
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
    // exact L2 top-5 baseline for the q108 query set (vec_id < 3)
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val d2 = aggregate(zip_with(col("qv"), col("v"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d"), col("n_id"))
    val exact = broadcast(q).join(e, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), d2.as("d"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(rerank: Int): Double = {
      val ann = Similarity.annPqAdc(spark, sf0001, 5, rerank = rerank).collect()
      ann.map(r => r.getLong(0)).distinct.length shouldBe 3
      ann.map(r => (r.getLong(0), r.getLong(2))).count(exact.contains).toDouble / exact.size
    }
    // A true-top-5 member inside the shortlist always survives the exact
    // re-rank, so recall is provably monotone in shortlist depth — the
    // published ADC recall/scan-cost dial. (The 500-vector fixture corpus
    // is near-uniform on the sphere — the PQ-hard case: reconstruction
    // error ~0.45 vs a true-distance spread of ~0.5 — so recall climbs
    // gradually with depth, exactly as the PQ paper's ADC curves show;
    // clustered real embeddings sit far above these floors.)
    val r8 = recallAt(8)
    val r32 = recallAt(32)
    val rDefault = recallAt(64)
    info(f"PQ-ADC recall@5: rerank=8 → $r8%.3f, 32 → $r32%.3f, 64 → $rDefault%.3f")
    r8 should be <= r32
    r32 should be <= rDefault
    r32 should be >= 0.5
    // the default depth (64 of 500 — an 8x scan cut) clears a 0.6 floor
    rDefault should be >= 0.6
  }

  test("native graft_l2sq expression matches the interpreted HOF distance bit-for-bit") {
    spark.catalog.functionExists("graft_l2sq") shouldBe true
    val e = graft.sources.Tables.read(spark, sf0001, "embeddings")
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
      .limit(50)
    val q = e.select(col("vec_id").as("q_id"), col("v").as("qv")).limit(5)
    val both = q.crossJoin(e)
      .select(
        call_function("graft_l2sq", col("qv"), col("v")).as("native"),
        VectorFunctions.distSq(col("qv"), col("v")).as("hof"))
      .collect()
    both.length shouldBe 250
    both.foreach { r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
  }

  test("native graft_cosine expression matches the interpreted HOF cosine bit-for-bit") {
    spark.catalog.functionExists("graft_cosine") shouldBe true
    val e = graft.sources.Tables.read(spark, sf0001, "embeddings")
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
      .limit(50)
    val q = e.select(col("vec_id").as("q_id"), col("v").as("qv")).limit(5)
    val both = q.crossJoin(e)
      .select(
        call_function("graft_cosine", col("qv"), col("v")).as("native"),
        VectorFunctions.cosine(col("qv"), col("v")).as("hof"))
      .collect()
    both.length shouldBe 250
    both.foreach { r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
  }

  test("df-cap drops boilerplate-only pairs and leaves organic near-dups untouched") {
    import spark.implicits._
    // 20 docs sharing ONLY a boilerplate sentence (plus unique filler), and
    // one planted near-dup pair (21, 22) sharing organic content.
    val boiler = "this content is provided under the standard license terms"
    val organic = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docsDf = ((1L to 20L).map(i => (i, s"$boiler unique$i filler$i pad$i end$i")) ++
      Seq((21L, organic + " tail one"), (22L, organic + " tail two"),
        (23L, "too short"))).toDF("doc_id", "text") // <5 tokens: no shingles, no crash
    val uncapped = Dedup.ngramJaccardPairsFrom(docsDf, dfCap = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val capped = Dedup.ngramJaccardPairsFrom(docsDf, dfCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // uncapped: the df=20 boilerplate shingles pair up all 20 docs
    uncapped.keys.count(p => p._1 <= 20 && p._2 <= 20) shouldBe 190
    // capped: boilerplate-only pairs vanish entirely
    capped.keys.count(p => p._1 <= 20 && p._2 <= 20) shouldBe 0
    // the organic near-dup pair survives with its Jaccard unchanged
    capped((21L, 22L)) shouldBe uncapped((21L, 22L))
    capped((21L, 22L)) should be > 0.5
  }

  test("embedding LSH near-dup: no false positives, recall floor, fixture equality") {
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact all-pairs reference at a given threshold (test-only cross join)
    def exactPairs(threshold: Double) = {
      val e = graft.sources.Tables.read(spark, sf0001, "embeddings")
        .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
      e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          round(VectorFunctions.cosine(col("a.v"), col("b.v")), 6).as("sim"))
        .filter(col("sim") >= threshold)
    }
    // at a sub-threshold cut (0.45) banding misses occur — pin subset + floor
    val exact45 = pairSet(exactPairs(0.45))
    val lsh45 = pairSet(Dedup.embeddingNeardupLsh(spark, sf0001, threshold = 0.45))
    exact45 should not be empty
    lsh45.subsetOf(exact45) shouldBe true // exact verification: no false positives
    (lsh45.size.toDouble / exact45.size) should be >= 0.5
    // at the registered threshold (0.5) every fixture pair collides in a
    // band: the LSH query equals the exact all-pairs result (the oracle)
    pairSet(SparkEntry.queries("q47_embedding_neardup")(spark, sf0001)) shouldBe
      pairSet(exactPairs(0.5))
  }

  test("SimHash hamming retrieval finds EVERY pair within the radius (pigeonhole)") {
    val sigs = SparkEntry.queries("q37_simhash")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // brute-force ground truth over all signature pairs
    val truth = (for {
      i <- sigs.indices.iterator; j <- (i + 1) until sigs.length
      d = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) if d <= 3
      a = math.min(sigs(i)._1, sigs(j)._1); b = math.max(sigs(i)._1, sigs(j)._1)
    } yield (a, b, d.toLong)).toSet
    val got = SparkEntry.queries("q58_simhash_hamming")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    truth should not be empty
    got shouldBe truth // guaranteed recall AND no false positives
  }

  test("native graft_lsh_bands matches the interpreted HOF band values exactly") {
    spark.catalog.functionExists("graft_lsh_bands") shouldBe true
    val planes = Similarity.hyperplanes(60, 64)
    val e = graft.sources.Tables.read(spark, sf0001, "embeddings")
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
    val both = e.select(
      Similarity.bandValuesFast(spark, col("v"), planes, 5).as("native"),
      Similarity.bandValues(col("v"), planes, 5).as("hof")).collect()
    both should not be empty
    both.foreach { r =>
      r.getSeq[Long](0) shouldBe r.getSeq[Long](1)
    }
  }

  test("exact dedup groups case/whitespace variants together") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "other doc")
    ).toDF("doc_id", "text")
    val grouped = df
      .select(col("doc_id"), graft.operators.TextAnalytics.fingerprint(col("text")).as("fp"))
      .groupBy("fp").agg(min("doc_id").as("survivor"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    grouped(1L) shouldBe 2L // docs 1+2 collapse, survivor=1
    grouped(3L) shouldBe 1L
  }

  test("SemDeDup: an exact copy is dropped inside its cluster, spread vectors survive") {
    import spark.implicits._
    // k=2 centroids are vecs 0 and 1. vec 2 leans toward centroid 0, vec 3
    // toward centroid 1, vec 4 is an exact copy of vec 2 (same cluster,
    // cosine 1), vec 5 is orthogonal to both centroids (ties break to the
    // lowest cluster id).
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0, 0.0)),
      (2L, Seq(1.0, 0.5, 0.0, 0.0)),
      (3L, Seq(0.0, 1.0, 0.5, 0.0)),
      (4L, Seq(1.0, 0.5, 0.0, 0.0)),
      (5L, Seq(0.0, 0.0, 0.0, 1.0))).toDF("vec_id", "v")
    val out = Similarity.semanticDedupFrom(vecs, k = 2, tau = 0.95).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    out(0L)._1 shouldBe 0L
    out(1L)._1 shouldBe 1L
    out(2L)._1 shouldBe 0L
    out(3L)._1 shouldBe 1L
    out(4L)._1 shouldBe 0L
    out(5L)._1 shouldBe 0L // orthogonal tie → lowest centroid id
    // only the exact copy is dropped, with its duplicate's cosine recorded
    out(4L)._2 shouldBe 1.0
    out(4L)._3 shouldBe 0L
    out.filter(_._1 != 4L).values.foreach(_._3 shouldBe 1L)
    // the copy's survivor (lower id twin) stays
    out(2L)._3 shouldBe 1L
  }

  test("declarative k-means refinement lowers total cost and keeps all vectors") {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.read(spark, sf0001, "embeddings")
      .select(col("vec_id"), graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    val n = e.count()
    val refined = Similarity.kmeansRefine(e, k = 8, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    refined.length.toLong shouldBe n                 // every vector assigned
    refined.map(_._2).distinct.foreach(c => c should (be >= 0L and be < 8L))
    // Lloyd's monotonicity: cost after refinement <= the seed assignment's
    val seed = Similarity.kmeansRefine(e, k = 8, iters = 0)
      .agg(sum(col("d2"))).head().getDouble(0)
    refined.map(_._3).sum should be <= seed + 1e-6
  }

  test("recallAuditFrom reports exact per-query counts and recall (synthetic miss)") {
    import spark.implicits._
    // exact top-3 for two queries; the "ann" side misses one neighbor of q0
    // and contains one extra non-exact neighbor (precision side)
    val exact = Seq((0L, 10L), (0L, 11L), (0L, 12L), (1L, 20L), (1L, 21L), (1L, 22L))
      .toDF("q_id", "n_id")
    val ann = Seq((0L, 10L), (0L, 11L), (0L, 99L), (1L, 20L), (1L, 21L), (1L, 22L))
      .toDF("q_id", "n_id")
    val out = Similarity.recallAuditFrom(ann, exact).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    out shouldBe Array((0L, 3L, 3L, 2L, 0.666667), (1L, 3L, 3L, 3L, 1.0))
  }

  test("the oracled ANN audits report arithmetically consistent recall rows") {
    // The audits MEASURE, they don't promise: on the small sf0.001 corpus
    // the 8-plane LSH honestly reports recall 0 (random 64-dim vectors are
    // near-orthogonal, so true neighbors rarely share all sign bits), and
    // the oracle stays hash-green because DuckDB computes the same number —
    // that is the point of the replay design. What must ALWAYS hold is the
    // audit arithmetic itself; recall floors for the production-shaped
    // tiers live in the planted-near-dup tests above.
    for (q <- Seq("q190_ann_lsh_audit", "q191_ann_ivf_audit", "q192_pq_adc_audit")) {
      val rows = SparkEntry.queries(q)(spark, sf0001).collect()
      withClue(s"$q: ") {
        rows.length shouldBe 3
        all(rows.map(_.getAs[Long]("n_exact"))) shouldBe 5L
        rows.foreach { r =>
          val (nx, nh) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_hit"))
          nh should be <= nx
          nh should be <= r.getAs[Long]("n_ann")
          r.getAs[Double]("recall") shouldBe
            (BigDecimal(nh.toDouble / nx).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
    }
    // and the PQ/ADC audit must beat chance on the fixture: the 64-deep
    // ADC shortlist re-ranked exactly recovers most true L2 neighbors
    val pq = SparkEntry.queries("q192_pq_adc_audit")(spark, sf0001).collect()
    (pq.map(_.getAs[Long]("n_hit")).sum.toDouble /
      pq.map(_.getAs[Long]("n_exact")).sum) should be >= 0.5
  }

  test("native graft_simhash64 is bit-identical to the HOF form (corpus + edges)") {
    import spark.implicits._
    // live corpus: every document must agree
    val d = graft.sources.Tables.read(spark, sf0001, "documents")
    val both = d.select(col("doc_id"),
        Dedup.simhash64.as("hof"),
        call_function("graft_simhash64", col("text")).as("native"))
      .filter(col("hof") =!= col("native"))
    both.count() shouldBe 0L
    // adversarial edges: empty, all-spaces, interior runs of spaces (empty
    // tokens vote too), control chars (SQL trim must NOT strip them), unicode
    val edges = Seq("", "   ", "a  b", " a b ", "\ta\n", "caf\u00e9 \u00fc", "x")
      .toDF("text")
    val e = edges.select(Dedup.simhash64.as("hof"),
        call_function("graft_simhash64", col("text")).as("native")).collect()
    e.foreach(r => r.getLong(1) shouldBe r.getLong(0))
  }

  test("q200 incremental admission covers the batch exactly and agrees with q36's cross-split pairs") {
    val adm = Dedup.incrementalLshAdmission(spark, sf0001).collect()
    val batchIds = graft.sources.Tables.read(spark, sf0001, "documents")
      .filter(col("doc_id") % 10 === 7).select(col("doc_id"))
      .collect().map(_.getLong(0)).sorted
    // one row per batch document, nothing else
    adm.map(_.getLong(0)).sorted shouldBe batchIds
    adm.foreach { r =>
      val admitted = r.getBoolean(4)
      // verdict coheres with the match columns
      admitted shouldBe r.isNullAt(2)
      admitted shouldBe r.isNullAt(3)
      if (!admitted) {
        r.getLong(2) % 10 should not be 7L // dup_of is a CORPUS doc
        r.getDouble(3) should be >= 0.8
      }
    }
    // any q36 near-dup pair crossing the batch/corpus split must reject its
    // batch endpoint (q200's candidates are exactly q36's cross-split subset,
    // and the verification math is identical)
    val rejected = adm.filter(!_.getBoolean(4)).map(_.getLong(0)).toSet
    val cross = Dedup.minhashLshPairs(spark, sf0001).collect().flatMap { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      (a % 10 == 7, b % 10 == 7) match {
        case (true, false) => Some(a)
        case (false, true) => Some(b)
        case _             => None
      }
    }.toSet
    cross.foreach(id => rejected should contain(id))
  }

  test("q204 kNN classifier: probes are the held-out slice, votes are bounded, pred is a cell label") {
    val e = graft.sources.Tables.read(spark, sf0001, "embeddings")
    val out = Similarity.knnClassifySeeded(spark, sf0001).collect()
    // one row per held-out vector whose IVF cell contains >= 1 labeled vector
    // (at this fixture density every cell does, so coverage is exact)
    val heldOut = e.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted
    out.map(_.getLong(0)).sorted shouldBe heldOut
    val labels = e.select(col("label")).distinct().collect().map(_.getInt(0)).toSet
    out.foreach { r =>
      labels should contain(r.getInt(2)) // pred is a real label
      r.getLong(3) should (be >= 1L and be <= 5L) // votes from a top-5 set
    }
    // majority semantics: a unanimous 5-vote row must predict that label's
    // own class even when it disagrees with the true label; spot-check by
    // re-deriving determinism (two runs bit-identical)
    val again = Similarity.knnClassifySeeded(spark, sf0001).collect()
    again.map(_.toString).sorted shouldBe out.map(_.toString).sorted
  }

  test("q207 dominant direction: max-abs normalized, positive variance, stable under an extra iteration") {
    val rows = Similarity.dominantDirection(spark, sf0001).orderBy(col("pos")).collect()
    rows.length shouldBe 64
    val w3 = rows.map(_.getAs[Double]("loading"))
    w3.map(math.abs).max shouldBe 1.0 +- 1e-9 // max-abs normalization
    val vas = rows.map(_.getAs[Double]("var_along")).distinct
    vas.length shouldBe 1
    vas.head should be > 0.0
    // power iteration is converging: one more round barely rotates the
    // direction. The 50-vector sf0.001 draw has a small eigengap (measured
    // |cos| ~0.988 between rounds 3 and 4), so the gate is 0.95 — a wiring
    // bug (wrong matrix, unnormalized update) lands far below that.
    val w4 = Similarity.dominantDirection(spark, sf0001, iters = 4)
      .orderBy(col("pos")).collect().map(_.getAs[Double]("loading"))
    val cos = w3.zip(w4).map { case (a, b) => a * b }.sum /
      (math.sqrt(w3.map(x => x * x).sum) * math.sqrt(w4.map(x => x * x).sum))
    math.abs(cos) should be > 0.95
  }

  test("q226 weighted jaccard: bounded, defined on exactly the candidate pairs") {
    val rows = SparkEntry.queries("q226_weighted_jaccard")(spark, sf0001).collect()
    val candidates = Dedup.sharedNgramJaccardPairs(spark, sf0001)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe candidates
    rows.foreach { r =>
      val (sj, wj) = (r.getAs[Double]("set_jaccard"), r.getAs[Double]("weighted_jaccard"))
      sj should (be > 0.0 and be <= 1.0)
      wj should (be >= 0.0 and be <= 1.0)
    }
    // the planted near-dup pairs overlap heavily in BOTH metrics
    val top = rows.maxBy(_.getAs[Double]("set_jaccard"))
    top.getAs[Double]("weighted_jaccard") should be > 0.5
  }

  test("q227 boilerplate openers: ranks are a dense 1..k prefix with non-increasing counts") {
    val rows = SparkEntry.queries("q227_boilerplate_openers")(spark, sf0001).collect()
    rows.length should be > 0
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Long]("rk"))
      sorted.map(_.getAs[Long]("rk")) shouldBe (1L to sorted.length).toArray
      sorted.map(_.getAs[Long]("n_docs")).sliding(2).filter(_.length == 2)
        .foreach(p => p(1) should be <= p(0))
      g.foreach(_.getAs[Double]("share") should (be > 0.0 and be <= 1.0))
    }
  }

  test("q218 soft-dedup weights conserve mass: one unit of gradient per cluster") {
    val rows = SparkEntry.queries("q218_softdedup_weights")(spark, sf0001).collect()
    val docs = graft.sources.Tables.read(spark, sf0001, "documents").count()
    rows.length.toLong shouldBe docs // every doc gets a weight
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (_, members) =>
      members.map(_.getAs[Long]("cluster_size")).distinct.length shouldBe 1
      members.head.getAs[Long]("cluster_size") shouldBe members.length.toLong
      // cluster mass ≈ 1 (each member carries round(1/n, 6))
      members.map(_.getAs[Double]("weight")).sum shouldBe 1.0 +- 1e-4
    }
    rows.map(_.getAs[Double]("weight")).sum shouldBe byCluster.size.toDouble +- 1e-3
  }

  test("q219 JL distortion: estimates are positive and concentrate around 1") {
    val rows = SparkEntry.queries("q219_jl_distortion")(spark, sf0001).collect()
    rows.length shouldBe 500
    rows.foreach { r =>
      r.getAs[Double]("norm_sq") should be > 0.0
      r.getAs[Double]("est_norm_sq") should be >= 0.0
    }
    // k=8 is a coarse sketch: individual ratios swing, but the corpus mean
    // must sit near 1 (the estimator is unbiased) — a wiring bug (wrong
    // scaling constant, unsquared dots) lands far away
    val mean = rows.map(_.getAs[Double]("distortion")).sum / rows.length
    mean shouldBe 1.0 +- 0.35
  }

  test("q220 separability: random-ish labels are NOT separable and the report says so") {
    val rows = SparkEntry.queries("q220_separability")(spark, sf0001).collect()
    rows.length shouldBe 10
    rows.foreach { r =>
      r.getAs[Double]("intra_mean") should be > 0.0
      r.getAs[Double]("inter_dist") should be > 0.0
      r.getInt(3) should not be r.getInt(0) // nearest is a DIFFERENT label
      // fixture labels are near-random in embedding space: the nearest
      // foreign centroid sits well inside the class's own spread
      r.getAs[Double]("separability") should be < 1.0
    }
  }

  test("q217 entity closure: every matched pair lands in one entity, entities have >= 2 members") {
    val parts = graft.sources.Tables.read(spark, sf0001, "part")
      .select(col("p_partkey"), col("p_name"))
    val pairs = Dedup.fuzzyPairsAllFrom(parts).collect()
    val entities = SparkEntry.queries("q217_entity_clusters")(spark, sf0001).collect()
    entities.foreach { r =>
      r.getAs[Long]("n_members") should be >= 2L // singletons are not entities
    }
    // members across entities == distinct pair endpoints (closure covers
    // exactly the edge-incident nodes)
    val endpoints = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    entities.map(_.getAs[Long]("n_members")).sum shouldBe endpoints.size.toLong
    // and the transitive closure merges every pair: recompute labels and
    // assert co-membership of each matched pair
    val edges = Dedup.fuzzyPairsAllFrom(parts)
      .select(col("key_a").as("a"), col("key_b").as("b"))
    val lbl = graft.operators.Cluster.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ent(k: Long): Long = lbl.getOrElse(k, k)
    pairs.foreach(r => ent(r.getLong(0)) shouldBe ent(r.getLong(1)))
  }

  test("q216 label-noise audit: every class reports, totals cover the cell-joined corpus") {
    val rows = Similarity.knnLabelNoise(spark, sf0001).collect()
    val e = graft.sources.Tables.read(spark, sf0001, "embeddings")
    rows.map(_.getInt(0)).sorted shouldBe
      e.select(col("label")).distinct().collect().map(_.getInt(0)).sorted
    rows.foreach { r =>
      val (n, d) = (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_disagree"))
      d should be <= n
      r.getAs[Double]("disagree_rate") shouldBe
        BigDecimal(d.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // every vector with >=1 same-cell neighbor is audited exactly once
    rows.map(_.getAs[Long]("n_vecs")).sum should be <= e.count()
    // random-ish fixture labels are NOT separable: disagreement must be
    // far above zero overall (a near-zero rate would mean the audit is
    // comparing each vector with itself)
    val overall = rows.map(_.getAs[Long]("n_disagree")).sum.toDouble /
      rows.map(_.getAs[Long]("n_vecs")).sum
    overall should be > 0.3
  }

  test("q208 ABTT residual: Pythagorean split, centered projections, ratio <= 1") {
    val w = Similarity.dominantDirection(spark, sf0001)
      .orderBy(col("pos")).collect().map(_.getAs[Double]("loading"))
    val ww = w.map(x => x * x).sum
    val rows = Similarity.abttResidual(spark, sf0001).collect()
    rows.length shouldBe
      graft.sources.Tables.read(spark, sf0001, "embeddings").count()
    rows.foreach { r =>
      val (p, nc, nr, ratio) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // removing an orthogonal projection: ||xc||^2 = ||r||^2 + p^2·||w||^2
      nc * nc shouldBe (nr * nr + p * p * ww) +- 1e-3
      ratio should (be >= 0.0 and be <= 1.0 + 1e-6)
      nr should be <= nc + 1e-9
    }
    // projections of CENTERED data sum to ~0 (Σ xc = 0 up to rounding)
    math.abs(rows.map(_.getDouble(1)).sum / rows.length) should be < 1e-3
  }
}
