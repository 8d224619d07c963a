package graft

import graft.operators.Tokenizer
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Semantics checks for the tokenizer-induction statistics on planted
  * corpora (fixture values are covered by the q81/q82 oracle gate). */
class TokenizerSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  test("bigram counting is adjacent-only and never crosses document boundaries") {
    val corpus = Seq(
      (1L, "a b c"),   // pairs: (a,b) (b,c)
      (2L, "c a b"),   // pairs: (c,a) (a,b)
      (3L, "b"),       // no pairs
      (4L, "")         // no pairs
    ).toDF("doc_id", "text")
    val got = Tokenizer.bigramMergeCandidates(corpus, k = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    got shouldBe Map(("a", "b") -> 2L, ("b", "c") -> 1L, ("c", "a") -> 1L)
    // ("c","b") would require pairing across doc 1's end and doc 3 — absent
  }

  test("the top merge candidate is the planted dominant pair (BPE argmax)") {
    val corpus = (0L until 50L).map(i => (i, "new york new york city and more tokens"))
      .toDF("doc_id", "text")
    val top = Tokenizer.bigramMergeCandidates(corpus, k = 1).head()
    (top.getString(0), top.getString(1)) shouldBe ("new", "york")
    top.getLong(2) shouldBe 100L
  }

  test("pmi ranks an exclusive pair above a frequent-but-independent one") {
    // 'hong kong' always and only together; 'the cat' shares 'the' with
    // many other right-neighbors, so its PMI must be lower
    val corpus = (0L until 30L).map(i =>
      (i, s"hong kong the cat the dog the fish the bird w$i")).toDF("doc_id", "text")
    val pmi = Tokenizer.pmiCollocations(corpus, minCount = 10, k = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    pmi(("hong", "kong")) should be > pmi(("the", "cat"))
  }

  test("vocab head: rank is dense, coverage is monotone and consistent with the corpus total") {
    val rows = SparkEntry.queries("q96_vocab_head")(spark, TestSpark.sf0001).collect()
    rows.map(_.getLong(0)).toSeq shouldBe (1L to rows.length)
    val cov = rows.map(_.getDouble(4))
    cov.sliding(2).foreach { case Array(a, b) => b should be >= a; case _ => () }
    cov.last should be <= 1.0 + 1e-9
    // the final coverage equals (head occurrences) / (corpus tokens), recomputed independently
    val docs = graft.sources.Tables.read(spark, TestSpark.sf0001, "documents")
    val total = graft.operators.Retrieval.termFreqs(docs)
      .agg(org.apache.spark.sql.functions.sum("tf")).head().getLong(0)
    val headOcc = rows.map(_.getLong(2)).sum
    cov.last shouldBe (headOcc.toDouble / total) +- 1e-6
  }

  test("zipf slope recovers -1 on a planted power-law corpus, ~0 on a uniform one") {
    import spark.implicits._
    // token w_i appears floor(4000 / i) times: freq ∝ 1/rank → slope −1
    val zipfTokens = (1 to 40).flatMap(i => Seq.fill(4000 / i)(s"w${"%03d".format(i)}"))
    val zipf = Seq((1L, zipfTokens.mkString(" "))).toDF("doc_id", "text")
    val r = Tokenizer.zipfSlopeFrom(zipf).head()
    r.getLong(0) shouldBe 40L
    r.getDouble(1) shouldBe -1.0 +- 0.02
    // all-equal frequencies: the head is flat, slope ~ 0
    val flatTokens = (1 to 40).flatMap(i => Seq.fill(100)(s"w$i"))
    val flat = Seq((1L, flatTokens.mkString(" "))).toDF("doc_id", "text")
    Tokenizer.zipfSlopeFrom(flat).head().getDouble(1) shouldBe 0.0 +- 1e-9
  }

  test("sketch-verify heavy hitters equal the exact group-by, even with a tiny sketch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // adversarial: a sea of unique tokens trying to evict the two heavy ones
    val rng = new scala.util.Random(42)
    val docs = (1L to 40L).map { d =>
      val noise = (1 to 50).map(i => s"u${d}_$i")
      val heavy = Seq.fill(30)("alpha") ++ Seq.fill(15)("beta")
      (d, rng.shuffle(noise ++ heavy).mkString(" "))
    }.toDF("doc_id", "text")
    // k = 64 keeps the 1/k guarantee well under the heavy terms' shares
    val got = Tokenizer.heavyHitters(docs, support = 0.1, k = 64).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val toks = docs.select(explode(split(trim(col("text")), " ")).as("term"))
    val total = toks.count()
    val exact = toks.groupBy("term").count()
      .filter(col("count") >= total * 0.1).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    got shouldBe exact
    got.keySet shouldBe Set("alpha", "beta") // the planted pair, nothing else
  }

  test("oov rate: planted new-batch drift is counted occurrence-weighted") {
    import spark.implicits._
    // old half (even ids): vocabulary {a, b}; new half (odd ids): 6 tokens,
    // of which two x's and one y are unseen → OOV rate 3/6, 2 new terms
    val docs = Seq(
      (0L, "a b a b"), (2L, "b a"),
      (1L, "a x x y"), (3L, "a a")
    ).toDF("doc_id", "text")
    val r = Tokenizer.oovRateFrom(docs).head()
    r.getLong(0) shouldBe 6L   // new-batch token occurrences
    r.getLong(1) shouldBe 3L   // occurrence-weighted OOV
    r.getLong(2) shouldBe 2L   // distinct new terms (x, y)
    r.getDouble(3) shouldBe 0.5 +- 1e-9
  }

  test("heaps fit: beta ~ 1 for all-new tokens, ~ 0 for a closed vocabulary") {
    import spark.implicits._
    // every token unique → V(n) = n → β = 1 exactly
    val allNew = (1L to 50L).map(d =>
      (d, (1 to 20).map(i => s"w${d}_$i").mkString(" "))).toDF("doc_id", "text")
    Tokenizer.heapsFitFrom(allNew).head().getDouble(1) shouldBe 1.0 +- 1e-6
    // doc 1 introduces the whole vocabulary; later docs reuse it → slope ≈ 0
    val closed = (1L to 50L).map(d =>
      (d, (1 to 20).map(i => s"v$i").mkString(" "))).toDF("doc_id", "text")
    Tokenizer.heapsFitFrom(closed).head().getDouble(1) shouldBe 0.0 +- 0.05
  }
}
