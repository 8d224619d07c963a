package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Ranking-behavior checks for the retrieval tier (values vs DuckDB are
  * covered by the q78–q80 oracle gate): BM25's two defining monotonicities
  * on a planted corpus, conjunctive-search semantics, and the plan shape. */
class RetrievalSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}
  import spark.implicits._

  test("shared inverted-index layer equals fresh tokenization and serves identical query results") {
    import org.apache.spark.sql.functions.col
    val shared = Retrieval.sharedTermFreqs(spark, sf0001)
      .orderBy(col("doc_id"), col("term")).collect().map(_.toSeq).toSeq
    val fresh = Retrieval.termFreqs(
        graft.sources.Tables.read(spark, sf0001, "documents"))
      .orderBy(col("doc_id"), col("term")).collect().map(_.toSeq).toSeq
    shared shouldBe fresh
    val viaShared = SparkEntry.queries("q91_tfidf_cosine")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val viaFresh = Retrieval.tfidfCosinePairs(
        graft.sources.Tables.read(spark, sf0001, "documents"))
      .collect().map(_.toSeq).toSeq
    viaShared shouldBe viaFresh
  }

  private val corpus = Seq(
    (1L, "spark spark spark filler filler filler filler filler"), // high tf, short
    (2L, "spark filler filler filler filler filler filler filler"), // low tf, short
    (3L, "spark " + Seq.fill(60)("filler").mkString(" ")), // low tf, long
    (4L, "rare filler filler filler filler filler filler filler"), // rare term
    (5L, "filler filler filler filler filler filler filler filler")
  ).toDF("doc_id", "text")

  private def scores(terms: Seq[String]): Map[Long, Double] =
    Retrieval.bm25Search(corpus, terms, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("bm25 rewards term frequency and penalizes document length") {
    val s = scores(Seq("spark"))
    s(1L) should be > s(2L) // more occurrences, same length
    s(2L) should be > s(3L) // same occurrences, shorter doc
    s should not contain key(5L) // no match, no score
  }

  test("bm25 weights rare terms above common ones at equal tf and length") {
    // 'rare' appears in 1 doc, 'spark' in 3 — doc 4 must outrank doc 2
    val s = scores(Seq("spark", "rare"))
    s(4L) should be > s(2L)
  }

  test("conjunctive search returns exactly the docs containing every term") {
    val hits = Retrieval.keywordAndSearch(corpus, Seq("spark", "filler"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    hits.keySet shouldBe Set(1L, 2L, 3L)
    hits(1L) shouldBe 8L // 3 spark + 5 filler
  }

  test("tfidf ranks a doc's distinctive term first") {
    val top = Retrieval.tfidfTopTerms(corpus, k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    top(1L) shouldBe "spark"
    top(4L) shouldBe "rare"
    top(5L) shouldBe "filler"
  }

  test("tfidf cosine: proportional vectors score 1.0, blocked-rare-term pairs only") {
    val d = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha alpha beta beta gamma gamma"), // proportional to doc 1
      (3L, "alpha beta nu"), // partial overlap with 1/2
      (4L, "omega psi chi"), // disjoint vocabulary
      (5L, "omega psi chi")
    ).toDF("doc_id", "text")
    val pairs = Retrieval.tfidfCosinePairs(d, dfCap = 256, k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // cosine is scale-invariant: doubled counts are the same direction
    pairs((1L, 2L)) shouldBe 1.0
    pairs((4L, 5L)) shouldBe 1.0
    // partial vocabulary overlap lands strictly between
    pairs((1L, 3L)) should (be > 0.0 and be < 1.0)
    // disjoint-vocabulary pairs never become candidates (no shared term)
    pairs should not contain key((1L, 4L))
    pairs should not contain key((3L, 5L))
  }

  test("tfidf cosine: a term above the df-cap generates no candidate pairs") {
    // 'common' is in every doc (df=3 > cap=2) — with it blocked, no pair
    // shares a rare term, so no candidates exist at all
    val d = Seq(
      (1L, "common aaa"),
      (2L, "common bbb"),
      (3L, "common ccc")
    ).toDF("doc_id", "text")
    Retrieval.tfidfCosinePairs(d, dfCap = 2, k = 100).count() shouldBe 0L
    // raising the cap admits the common term and yields all 3 pairs
    Retrieval.tfidfCosinePairs(d, dfCap = 3, k = 100).count() shouldBe 3L
  }

  test("rrf fusion: consistent mid-rank across both legs beats a single-leg winner") {
    val d = Seq(
      (1L, "spark spark spark"), // sparse leg winner, absent from dense leg
      (2L, "nothing relevant"), // dense leg winner, no sparse match
      (3L, "spark filler") // rank 2 in BOTH legs
    ).toDF("doc_id", "text")
    val e = Seq(
      (0L, Array(1.0, 0.0)), // the query vector
      (2L, Array(1.0, 0.0)), // cosine 1.0 → dense rank 1
      (3L, Array(3.0, 1.0)) // cosine ~0.949 → dense rank 2
    ).toDF("vec_id", "v")
    val out = Retrieval.hybridRrf(d, e, Seq("spark"), queryVecId = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // 1/62 + 1/62 (doc 3) > 1/61 (either single-leg winner)
    out.head._1 shouldBe 3L
    out.head._2 shouldBe (2.0 / 62) +- 1e-6
    // the single-leg winners tie at 1/61 and break on doc_id
    out.map(_._1).toSeq shouldBe Seq(3L, 1L, 2L)
    out(1)._2 shouldBe (1.0 / 61) +- 1e-6
  }

  test("bm25 ranking plans as bounded top-k, never a nested-loop join") {
    val p = SparkEntry.queries("q79_bm25_search")(spark, sf0001)
      .queryExecution.executedPlan.toString
    p should include("TakeOrderedAndProject")
    // (the one-row broadcast scalar attach is a nested-loop join by nature;
    // what must never appear is an all-pairs product over data tables)
    p should not include "CartesianProduct"
  }

  test("phrase search demands adjacency, counts overlapping hits, beats AND on precision") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "x a b c y a b c"),     // phrase twice
      (2L, "a x b y c"),           // all terms, never adjacent — AND hit, phrase miss
      (3L, "a a a b c"),           // phrase once (trailing window)
      (4L, "c b a")                // reversed — order matters
    ).toDF("doc_id", "text")
    val hits = Retrieval.phraseSearch(corpus, Seq("a", "b", "c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    hits shouldBe Map(1L -> 2L, 3L -> 1L)
    // overlapping occurrences each count: "a a b c" windows at the repeated a
    Retrieval.phraseSearch(Seq((9L, "a a b c")).toDF("doc_id", "text"), Seq("a", "b", "c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((9L, 1L))
  }

  test("q237 PRF: expansion excludes query terms, pins 3 terms, and keeps a sane top-10") {
    val rows = SparkEntry.queries("q237_prf_expansion")(spark, TestSpark.sf0001)
      .orderBy(col("rank")).collect()
    rows.length shouldBe 10
    rows.map(_.getAs[Long]("rank")) shouldBe (1L to 10L).toArray
    val exp = rows.map(_.getAs[String]("exp_terms")).distinct
    exp.length shouldBe 1
    val terms = exp.head.split(",")
    terms.length shouldBe 3
    terms.toSet.intersect(Retrieval.QueryTerms.toSet) shouldBe empty
    // expansion broadens, it doesn't replace: the original query's top docs
    // remain competitive — at least a few survive into the expanded top-10
    rows.map(_.getAs[Long]("in_first_pass")).sum should be >= 3L
    // scores are the final ranking's sort key: non-increasing
    rows.sliding(2).filter(_.length == 2).foreach { p =>
      p(1).getAs[Double]("bm25") should be <= p(0).getAs[Double]("bm25") + 1e-9
    }
  }

  test("q228 eval: metrics are bounded and BM25 clears the conjunctive sanity floor") {
    val rows = SparkEntry.queries("q228_retrieval_eval")(spark, TestSpark.sf0001).collect()
    rows.length shouldBe Retrieval.EvalQueries.length
    rows.foreach { r =>
      val (h10, h20) = (r.getAs[Long]("hits_at_10"), r.getAs[Long]("hits_at_20"))
      h10 should be <= h20
      r.getAs[Double]("p_at_10") should (be >= 0.0 and be <= 1.0)
      Option(r.getAs[java.lang.Double]("recall_at_20"))
        .foreach(_.doubleValue should (be >= 0.0 and be <= 1.0))
      val rr = r.getAs[Double]("rr")
      rr should (be >= 0.0 and be <= 1.0)
      // a doc matching EVERY query term carries both idf masses — BM25 must
      // surface at least one conjunctive match in its top 20
      if (r.getAs[Long]("n_rel") > 0) rr should be > 0.0
    }
  }
}
