package graft

import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the dedup hot paths: times each pipeline
  * stage of q35/q36 separately so regressions can be attributed (the bench
  * only reports whole-query wall time). Not part of the driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val docsDf = Tables.read(spark, sfDir, "documents")
    val sh = Dedup.shingledFrom(docsDf)

    // warm-up
    docsDf.count()

    time("scan documents")(docsDf.count())
    time("shingled")(sh.count())
    val ex = sh.select(col("doc_id"), size(col("shingles")).as("n"), explode(col("shingles")).as("s"))
    time("exploded shingles")(ex.count())
    time("posting lists")(
      ex.groupBy(col("s")).agg(collect_list(struct(col("doc_id"), col("n"))).as("ds"))
        .filter(size(col("ds")) >= 2).count())
    time("q35 full")(SparkEntry.queries("q35_ngram_jaccard")(spark, sfDir).count())
    time("minhash signatures")(Dedup.minhashSignatures(sh).count())
    time("q36 full")(SparkEntry.queries("q36_minhash_lsh")(spark, sfDir).count())
    time("simhash signatures")(Dedup.simhashSignatures(spark, sfDir).count())
    time("q58 full")(SparkEntry.queries("q58_simhash_hamming")(spark, sfDir).count())
    spark.stop()
  }
}
