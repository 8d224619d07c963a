package graft

import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Planted-case guarantees of the curation tier (q85–q89); exact values are
  * covered by the DuckDB oracle gate. */
class CurationSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def df(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // 12 distinct filler tokens so organic 8-grams never collide
  private def filler(seed: Int, n: Int): String =
    (0 until n).map(i => s"tok${seed}x$i").mkString(" ")

  test("q85: a copied >=8-token span is counted in BOTH documents, disjoint docs score 0") {
    val span = "alpha beta gamma delta epsilon zeta eta theta" // exactly 8 tokens
    val d = df(
      1L -> s"${filler(1, 8)} $span ${filler(2, 8)}",
      2L -> s"${filler(3, 8)} $span",
      3L -> filler(4, 24))
    val out = Curation.dupSpanStatsFrom(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 3 shares nothing
    out(3L)._2 shouldBe 0L
    out(3L)._3 shouldBe 0.0
    // the shared 8-token span contributes exactly one duplicated window to
    // each holder (the surrounding filler is unique per doc)
    out(1L)._2 shouldBe 1L
    out(2L)._2 shouldBe 1L
    // window counts are n_tokens - 7 (positions, not distinct)
    out(1L)._1 shouldBe (8 + 8 + 8 - 7).toLong
    out(2L)._1 shouldBe (8 + 8 - 7).toLong
    out(2L)._3 shouldBe (1.0 / 9) +- 1e-6
  }

  test("q85: a longer shared run surfaces run_len - 7 duplicated windows per holder") {
    val run = (0 until 12).map(i => s"shared$i").mkString(" ") // 12 tokens
    val d = df(1L -> s"${filler(1, 8)} $run", 2L -> s"$run ${filler(2, 8)}")
    val out = Curation.dupSpanStatsFrom(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    out(1L) shouldBe 5L // 12 - 8 + 1
    out(2L) shouldBe 5L
  }

  test("q85: intra-document repetition alone is NOT duplication") {
    val span = "r1 r2 r3 r4 r5 r6 r7 r8"
    val d = df(1L -> s"$span $span", 2L -> filler(9, 16))
    val out = Curation.dupSpanStatsFrom(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    out(1L) shouldBe 0L // the span repeats only within doc 1
  }

  test("q86: case/punctuation variants collapse to one cluster with the min-id survivor") {
    val d = df(
      1L -> "The Quick, Brown Fox!",
      2L -> "the quick brown fox",
      3L -> "THE QUICK... BROWN FOX",
      4L -> "an unrelated document")
    val out = Curation.normalizedDedupFrom(d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getBoolean(3))).toMap
    out(1L)._1 shouldBe out(2L)._1
    out(2L)._1 shouldBe out(3L)._1
    out(4L)._1 should not be out(1L)._1
    Seq(1L, 2L, 3L).foreach(id => out(id)._2 shouldBe 3L)
    out(1L)._3 shouldBe true // min doc_id survives
    out(2L)._3 shouldBe false
    out(3L)._3 shouldBe false
    out(4L)._3 shouldBe true
    // raw-byte exact dedup (q34's fingerprint) does NOT see these as copies:
    // the normalization tier strictly extends it
    d.select(md5($"text")).distinct().count() shouldBe 4L
  }

  test("q86: punctuation folds to a token boundary, not to deletion") {
    val d = df(1L -> "a.b", 2L -> "a b", 3L -> "ab")
    val out = Curation.normalizedDedupFrom(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe out(2L)
    out(3L) should not be out(1L)
  }

  test("q87: batch rows already in the corpus are dropped; in-batch copies collapse; idempotent") {
    val corpus = df(1L -> "existing doc one", 2L -> "existing doc two")
    val batch = df(
      10L -> "existing doc one", // corpus duplicate → dropped
      11L -> "fresh doc",
      12L -> "fresh doc", // in-batch duplicate → collapses to id 11
      13L -> "another fresh doc")
    val out = Curation.incrementalDedupFrom(batch, corpus)
    out.select("doc_id").as[Long].collect().sorted shouldBe Array(11L, 13L)
    // idempotence: re-running the surviving batch against corpus+survivors drops everything
    val merged = corpus.union(df(11L -> "fresh doc", 13L -> "another fresh doc"))
    Curation.incrementalDedupFrom(batch, merged).count() shouldBe 0L
  }

  test("q88: cap is respected per source and the selection is partitioning-invariant") {
    val docs = (1L to 120L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val kept = Curation.sourceCapFrom(docs, n = 10)
    kept.groupBy("source").count().as[(String, Long)].collect()
      .foreach { case (_, c) => c shouldBe 10L }
    // deterministic under a different physical partitioning
    val kept2 = Curation.sourceCapFrom(docs.repartition(7, $"doc_id"), n = 10)
      .select("doc_id").as[Long].collect().sorted
    kept.select("doc_id").as[Long].collect().sorted shouldBe kept2
    // rank is dense 1..10 within each source
    kept.groupBy("source").agg(max("rk"), countDistinct("rk"))
      .as[(String, Long, Long)].collect()
      .foreach { case (_, mx, dc) => mx shouldBe 10L; dc shouldBe 10L }
  }

  test("containment >= jaccard for every pair on the fixture corpus") {
    // |A∩B|/min >= |A∩B|/union always; both sides compute from the same
    // posting-list pass, so the inequality also guards against the two
    // derivations drifting apart
    val docs = graft.sources.Tables.read(TestSpark.spark, TestSpark.sf0001, "documents")
    val j = Dedup.ngramJaccardPairsFrom(docs)
    val c = Dedup.ngramContainmentPairsFrom(docs)
    val joined = j.join(c, Seq("id_a", "id_b"), "full_outer")
    // identical pair sets (same candidate pipeline)...
    joined.filter($"jaccard".isNull || $"containment".isNull).count() shouldBe 0L
    // ...and the pointwise inequality (1e-9 absorbs the independent 6dp rounds)
    joined.filter($"containment" < $"jaccard" - 1e-9).count() shouldBe 0L
  }

  test("normalization fingerprint is idempotent: canonical text maps to itself") {
    // normalizing already-normalized text is a fixpoint, so re-ingesting a
    // cleaned corpus cannot re-cluster it differently
    val d = df(1L -> "Mixed. CASE,, and   spacing!", 2L -> "plain text")
    val once = d.select(Curation.normalizedFingerprint.as("fp"),
      trim(regexp_replace(regexp_replace(lower($"text"), "[^a-z0-9 ]", " "), " +", " ")).as("text"))
    val twice = once.select($"fp".as("fp1"), Curation.normalizedFingerprint.as("fp2"))
    twice.filter($"fp1" =!= $"fp2").count() shouldBe 0L
  }

  test("q89: a wholesale-quoted short doc has containment 1.0 while Jaccard stays low") {
    val short = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10" // 10 tokens → 6 shingles
    val long = s"${filler(1, 30)} $short ${filler(2, 30)}"
    val d = df(1L -> short, 2L -> long)
    val cont = Dedup.ngramContainmentPairsFrom(d).collect()
    cont.length shouldBe 1
    cont.head.getDouble(2) shouldBe 1.0
    val jac = Dedup.ngramJaccardPairsFrom(d).collect()
    jac.head.getDouble(2) should be < 0.2 // quote inclusion is invisible to Jaccard
  }

  private def chunkHashes(d: org.apache.spark.sql.DataFrame): Map[Long, Seq[String]] =
    d.select($"doc_id", Curation.cdcChunks().as("cks"))
      .select($"doc_id", expr("transform(cks, c -> c.h)").as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

  test("q97: CDC chunks partition every document (token counts sum to n_tokens)") {
    val d = graft.sources.Tables.read(spark, TestSpark.sf0001, "documents")
      .filter(graft.operators.TextAnalytics.nTokens($"text") >= 6)
    val withC = d.select(graft.operators.TextAnalytics.nTokens($"text").as("n"),
      Curation.cdcChunks().as("cks"))
      .select($"n", expr("aggregate(transform(cks, c -> c.n), 0L, (a, x) -> a + x)").as("s"),
        expr("size(filter(cks, c -> c.n < 1))").as("empties"))
    withC.filter($"n" =!= $"s").count() shouldBe 0L
    withC.filter($"empties" > 0).count() shouldBe 0L
  }

  test("q97: content-defined boundaries re-synchronize after a prefix insertion") {
    // The CDC property fixed-width chunking lacks: prepending text shifts
    // every fixed window, but content-defined cuts re-align within one
    // expected chunk, so the shared suffix re-hashes into identical chunks.
    val a = (0 until 60).map(i => s"cdctok$i").mkString(" ")
    val b = (0 until 10).map(i => s"prefix$i").mkString(" ") + " " + a
    val hs = chunkHashes(df(1L -> a, 2L -> b))
    val (ha, hb) = (hs(1L), hs(2L))
    ha.size should be >= 2 // the fixture text does produce interior cuts
    // every chunk of A after its first cut reappears verbatim in B
    val resync = ha.drop(1).toSet
    resync.subsetOf(hb.toSet) shouldBe true
    // and the differing region is confined to the seam: at most two extra
    // chunks of B (its prefix region) are not chunks of A
    (hb.toSet -- ha.toSet).size should be <= 2
  }
}
