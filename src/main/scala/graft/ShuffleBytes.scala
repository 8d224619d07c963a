package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only MEASURED shuffle-byte curves for the headline operators — the
  * round-18/19 verdicts' "measured shuffle bytes" task: BASELINE.md's
  * 100 TB cost-model table carries analytic bytes-per-row estimates; this
  * main records what ACTUALLY moves through the exchange (executor task
  * metrics: shuffle bytes written + total bytes read) per operator per
  * corpus, so the table's scaling claims rest on telemetry, not arithmetic.
  *
  * Method: one SparkListener accumulates task-level shuffle read/write
  * bytes; per (corpus, query) the counters are snapshotted around a full
  * `count()` of the registered query. Queries run in a FIXED order, so
  * session-cache builds (shared candidates, seeded models) are attributed
  * to the first query that needs them on each corpus — the same
  * deterministic attribution every run gets. Listener events drain
  * asynchronously; a settle pause brackets each snapshot (bytes are
  * per-run exact on a quiet host, not contention-sensitive like wall).
  *
  * Usage: runMain graft.ShuffleBytes [corpusDir ...]
  *        (defaults to /root/testdata/sf0.1 = the 1× corpus)
  * Heavy densifying tiers (near-dup pair output grows ~4×/doubling) are
  * capped via SPARK_GRAFT_SHUFFLE_HEAVY_MAX_DOCS (default 80k ≈ 16×) —
  * the cap is LOGGED per skip, never silent. Not part of the driver
  * contract. */
object ShuffleBytes {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config(graft.sources.Tables.nanosConf._1, graft.sources.Tables.nanosConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          ()
        }
      }
    })

    // Headline operators, one per cost-model tier (BASELINE.md round-18
    // table). `heavy` = output-densifying under the perturbed-replica
    // corpora (near-dup pairs grow ~4×/doubling) — measured to the same
    // 8×/16× horizon the wall-clock sweeps used, skipped above the cap.
    case class Op(name: String, heavy: Boolean = false)
    val ops = Seq(
      Op("q34_exact_dedup"),
      Op("q383_dedup_index_cdc"),
      Op("q36_minhash_lsh", heavy = true),
      Op("q58_simhash_hamming", heavy = true),
      Op("q385_embedding_neardup_recall", heavy = true),
      Op("q381_ivf_pq"),
      Op("q386_ann_index_cdc"),
      Op("q389_lsh_index_cdc"),
      Op("q364_label_propagation", heavy = true),
      Op("q380_sampled_quantile_audit"),
      Op("q158_exact_percentiles"),
      Op("q91_tfidf_cosine"))

    val heavyMaxDocs =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_HEAVY_MAX_DOCS", "80000").toLong

    def settle(): Unit = Thread.sleep(800) // let the listener bus drain

    for (dir <- dirs) {
      val docCount = spark.read.parquet(s"$dir/documents.parquet").count()
      for (op <- ops) {
        if (op.heavy && docCount > heavyMaxDocs)
          println(s"""{"tool":"shuffle_bytes","dir":"$dir","query":"${op.name}",""" +
            s""""skipped":"densifying tier capped at $heavyMaxDocs docs (corpus has $docCount)"}""")
        else {
          settle()
          val r0 = shufRead.get(); val w0 = shufWrite.get()
          val t0 = System.nanoTime()
          val rows = SparkEntry.queries(op.name)(spark, dir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          settle()
          val rd = shufRead.get() - r0; val wr = shufWrite.get() - w0
          println(f"""{"tool":"shuffle_bytes","dir":"$dir","docs":$docCount,""" +
            f""""query":"${op.name}","rows":$rows,"shuffle_write_bytes":$wr,""" +
            f""""shuffle_read_bytes":$rd,"wall_sec":$wall%.2f}""")
        }
      }
    }
    spark.stop()
  }
}
