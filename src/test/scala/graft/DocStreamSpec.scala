package graft

import java.nio.file.Files

import graft.streaming.DocStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Streaming near-dup ingest filter: arrivals probe a batch-built SimHash
  * bucket index of the reference corpus via a stateless stream-static join;
  * exact duplicates and hamming-close variants are flagged, genuinely new
  * content is not. */
class DocStreamSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private val refText =
    "the quick brown fox jumps over the lazy dog and keeps on running far away"
  private val otherText =
    "completely different content about spark shuffles partitions and executors at scale"

  private def writeArrivals(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft-docstream").toFile.getAbsolutePath
    val w = new java.io.PrintWriter(s"$dir/batch0.json")
    for ((id, text) <- rows)
      w.println(s"""{"doc_id":$id,"ts":"2024-01-01T00:0$id:00.000Z","text":"$text"}""")
    w.close()
    dir
  }

  test("arrivals matching the reference corpus are flagged; fresh content is not") {
    val reference = Seq((100L, refText), (101L, otherText)).toDF("doc_id", "text")
    val index = DocStream.referenceIndex(reference)

    val arrivals = writeArrivals(Seq(
      1L -> refText,                        // exact duplicate → hamming 0
      2L -> "brand new material mentioning neither corpus nor any reference tokens whatsoever at all today",
      3L -> otherText))                     // exact duplicate of the other ref
    val flags = DocStream.flagNearDups(DocStream.readArrivals(spark, arrivals), index)
    val q = flags.writeStream.format("memory").queryName("flags")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    spark.sql("SELECT doc_id FROM flags").collect().map(_.getLong(0)).sorted shouldBe Array(1L, 3L)
  }

  test("a hamming-close variant (verified <= 3 bits) is flagged through its shared chunk") {
    // find a one-token edit of refText whose simhash lands within 3 bits —
    // asserted, so the test exercises a genuine near-dup, not an exact copy
    val variants = (0 until 40).map(i => refText.replace("lazy", s"lazy$i"))
    val refSig = Seq(refText).toDF("text").select(graft.operators.Dedup.simhash64).head().getLong(0)
    val sigs = variants.toDF("text")
      .select(col("text"), graft.operators.Dedup.simhash64.as("sh")).collect()
    val near = sigs.find(r => java.lang.Long.bitCount(r.getLong(1) ^ refSig) <= 3)
      .map(_.getString(0))
    assume(near.nonEmpty, "no variant within 3 bits — corpus-dependent, not a failure")

    val index = DocStream.referenceIndex(Seq((100L, refText)).toDF("doc_id", "text"))
    val arrivals = writeArrivals(Seq(5L -> near.get, 6L -> otherText))
    val flags = DocStream.flagNearDups(DocStream.readArrivals(spark, arrivals), index)
    val q = flags.writeStream.format("memory").queryName("flags2")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    spark.sql("SELECT doc_id FROM flags2").collect().map(_.getLong(0)) shouldBe Array(5L)
  }
}
