package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Structural guarantees of the sampling/packing operators (values are
  * covered by the DuckDB oracle gate). */
class SamplingSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  test("hash sampling is deterministic, a subset, and tracks its target rates") {
    val a = SparkEntry.queries("q63_hash_sample")(spark, sf0001).collect()
    val b = SparkEntry.queries("q63_hash_sample")(spark, sf0001).collect()
    a.map(_.getLong(0)) shouldBe b.map(_.getLong(0)) // content-hash, not rand()
    val total = graft.sources.Tables.read(spark, sf0001, "documents").count()
    a.length.toLong should be < total
    // per-language realized rate is within a loose band of the configured
    // rate (the hash is uniform; sf0.001 strata are small, so band is wide)
    val byLang = graft.sources.Tables.read(spark, sf0001, "documents")
      .groupBy(col("lang")).count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    for ((lang, n) <- byLang) {
      val rate = Sampling.SampleRates.getOrElse(lang, Sampling.DefaultRate)
      val realized = kept.getOrElse(lang, 0L).toDouble / n
      realized should be >= math.max(0.0, rate - 0.35)
      realized should be <= math.min(1.0, rate + 0.35)
    }
  }

  test("unimax water-fill conserves the budget, honors caps, equalizes the uncapped") {
    val rows = SparkEntry.queries("q238_unimax_alloc")(spark, sf0001).collect()
    val tot = rows.map(_.getLong(1)).sum
    val budget = tot * 9 / 10 // floor(0.9 * corpus), integer math as in the query
    // capped sources are served exactly their cap; uncapped all get the
    // same share; the shares exhaust the budget (up to the 6-dp rounding
    // of the common share, spread over the uncapped count)
    val (capped, uncapped) = rows.partition(_.getLong(3) == 1L)
    capped.foreach(r => r.getDouble(4) shouldBe r.getLong(2).toDouble)
    uncapped.map(_.getDouble(4)).distinct.length should be <= 1
    val alloc = rows.map(_.getDouble(4)).sum
    math.abs(alloc - budget) should be <= 0.5 * math.max(1, uncapped.length)
    // every allocation respects its cap
    rows.foreach(r => r.getDouble(4) should be <= r.getLong(2).toDouble + 1e-9)
  }

  test("fixed-count stratum sample keeps exactly min(n, stratum) per source, hash-ordered") {
    val n = 40
    val rows = SparkEntry.queries("q111_stratum_topn")(spark, sf0001).collect()
    val strata = graft.sources.Tables.read(spark, sf0001, "documents")
      .groupBy(col("source")).count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = rows.groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    for ((src, total) <- strata)
      kept.getOrElse(src, 0L) shouldBe math.min(n.toLong, total)
    // rn is 1..k and u is non-decreasing within each stratum (hash order)
    rows.groupBy(_.getString(0)).values.foreach { g =>
      val sorted = g.sortBy(_.getLong(1))
      sorted.map(_.getLong(1)) shouldBe (1L to sorted.length.toLong).toArray
      val us = sorted.map(_.getDouble(3))
      us.zip(us.tail).foreach { case (a, b) => a should be <= b }
    }
  }

  test("weighted priority sample favors heavy documents and is deterministic") {
    val a = Sampling.weightedPrioritySample(spark, sf0001, 15).collect()
    val b = Sampling.weightedPrioritySample(spark, sf0001, 15).collect()
    a.map(_.getLong(0)) shouldBe b.map(_.getLong(0))
    // Efraimidis–Spirakis inclusion tracks weight: the sample's mean
    // n_chars must exceed the corpus mean (weights ARE n_chars)
    val sampleMean = a.map(_.getLong(2)).sum.toDouble / a.length
    val corpusMean = graft.sources.Tables.read(spark, sf0001, "documents")
      .agg(avg(col("n_chars"))).head().getDouble(0)
    sampleMean should be > corpusMean
    // keys are sorted ascending (smallest-key-wins draw)
    val ks = a.map(_.getDouble(3))
    ks.zip(ks.tail).foreach { case (x, y) => x should be <= y }
  }

  test("mixture rates downsample every language to the smallest stratum") {
    val rows = SparkEntry.queries("q64_mixture_rates")(spark, sf0001).collect()
    val minN = rows.map(_.getLong(1)).min
    rows.foreach { r =>
      r.getDouble(2) should be > 0.0
      r.getDouble(2) should be <= 1.0
      // rate * stratum size recovers the min stratum (up to rounding)
      (r.getDouble(2) * r.getLong(1)) shouldBe minN.toDouble +- 0.01 * r.getLong(1)
    }
    rows.filter(_.getLong(1) == minN).foreach(_.getDouble(2) shouldBe 1.0)
  }

  test("packing fills chunks sequentially within the token budget") {
    val rows = SparkEntry.queries("q65_pack_chunks")(spark, sf0001).collect()
    val docs = graft.sources.Tables.read(spark, sf0001, "documents")
    val maxDocTokens = docs
      .select(max(graft.operators.TextAnalytics.nTokens(col("text")))).collect()(0).getLong(0)
    rows.groupBy(_.getString(0)).foreach { case (_, chunks) =>
      // chunk ids are contiguous from 0 per language
      chunks.map(_.getLong(1)).sorted shouldBe (0L until chunks.length.toLong).toArray
      // a chunk only ever overflows by the one doc that crossed the boundary
      chunks.foreach(_.getLong(3) should be < 512L + maxDocTokens)
      // sequential fill leaves no sparse chunk: a non-last chunk spans from
      // its first doc's start (≤ boundary + max doc overflow) to past the
      // next boundary, so it holds at least budget − maxDocTokens tokens
      chunks.sortBy(_.getLong(1)).dropRight(1)
        .foreach(_.getLong(3) should be >= 512L - maxDocTokens)
    }
    // packing partitions the corpus: doc counts sum to the table size
    rows.map(_.getLong(2)).sum shouldBe docs.count()
  }

  test("holdout split partitions the corpus near the 80/10/10 target, independent of the sample hash") {
    val rows = SparkEntry.queries("q68_split_assign")(spark, sf0001).collect()
    val total = graft.sources.Tables.read(spark, sf0001, "documents").count()
    rows.map(_.getLong(2)).sum shouldBe total // every doc lands in exactly one split
    val bySplit = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    bySplit.keySet shouldBe Set("train", "val", "test")
    val trainFrac = bySplit("train").toDouble / total
    trainFrac shouldBe 0.8 +- 0.12 // uniform hash, small corpus → wide band
    // the ':split' salt decorrelates the holdout from q63's sampling hash:
    // sampled-out documents must appear in every split, not pool in one
    val sampled = SparkEntry.queries("q63_hash_sample")(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    val perDocSplit = graft.sources.Tables.read(spark, sf0001, "documents")
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(concat(cast(doc_id as string), ':split')), 1, 4), 16, 10) as bigint) % 100").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val droppedSplits = perDocSplit.filterNot(p => sampled(p._1)).map(_._2 < 80).toSet
    droppedSplits shouldBe Set(true, false) // dropped docs span train and holdout
  }

  test("training order shards are contiguous, complete, and deterministic") {
    val rows = SparkEntry.queries("q70_training_order")(spark, sf0001).collect()
    val docs = graft.sources.Tables.read(spark, sf0001, "documents")
    rows.length.toLong shouldBe docs.count() // a permutation, not a sample
    rows.map(_.getLong(2)).distinct.length shouldBe rows.length
    rows.groupBy(_.getLong(0)).foreach { case (_, shard) =>
      // positions are 1..n with no gaps inside every shard
      shard.map(_.getLong(1)).sorted shouldBe (1L to shard.length.toLong).toArray
    }
    val again = SparkEntry.queries("q70_training_order")(spark, sf0001).collect()
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) shouldBe
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("overlapping chunking covers every token and overlaps by chunk-stride") {
    import spark.implicits._
    val text = (1 to 150).map(i => s"t$i").mkString(" ") // 150 tokens
    val corpus = Seq((1L, text), (2L, "a b c")).toDF("doc_id", "text")
    val rows = Sampling.chunkOverlap(corpus, chunk = 64, stride = 48)
      .orderBy(col("doc_id"), col("chunk_id")).collect()
    val doc1 = rows.filter(_.getLong(0) == 1L).map(r => r.getString(3).split(" ").toSeq)
    // 150 tokens, chunk 64, stride 48 -> starts 0/48/96, last covers to 150
    doc1.length shouldBe 3
    doc1(0).length shouldBe 64
    doc1(2) shouldBe (97 to 150).map(i => s"t$i") // final short window
    // consecutive windows share exactly chunk - stride = 16 tokens
    doc1(0).takeRight(16) shouldBe doc1(1).take(16)
    // every source token appears in some chunk, in order
    (doc1(0) ++ doc1(1).drop(16) ++ doc1(2).drop(16)) shouldBe (1 to 150).map(i => s"t$i")
    // a doc shorter than one window yields exactly one short chunk
    val doc2 = rows.filter(_.getLong(0) == 2L)
    doc2.length shouldBe 1
    doc2.head.getString(3) shouldBe "a b c"
  }

  test("temperature mixture compresses source spread and still sums to one") {
    val rows = SparkEntry.queries("q101_temperature_mix")(spark, sf0001).collect()
      .map(r => (r.getDouble(3), r.getDouble(4))) // (raw_share, temp_share)
    rows.length should be > 1
    rows.map(_._1).sum shouldBe 1.0 +- 1e-4
    rows.map(_._2).sum shouldBe 1.0 +- 1e-4
    // T=0.7 < 1 flattens the mixture: the big/small ratio strictly shrinks
    val rawSpread = rows.map(_._1).max / rows.map(_._1).min
    val tempSpread = rows.map(_._2).max / rows.map(_._2).min
    tempSpread should be < rawSpread
    // and ordering is preserved (monotone transform)
    rows.sortBy(_._1).map(_._2) shouldBe rows.map(_._2).sorted
  }
}
