package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev-only per-commit FIXED-JOB breakdown for the VersionedLayer merge
  * path — the round-18/19 profiling leg: the streaming maintainers' close
  * cost (q391/q392/q396) is "per-commit fixed jobs", and this main shows
  * exactly which jobs those are and what each costs, by call site, for one
  * serializable merge commit under the two layouts that bracket reality:
  *
  *   - KEY-LOCAL standing files + out-of-range delta (q393 / nightly
  *     date-partitioned CDC): the stats envelope prunes every file from
  *     the manifest alone and the discovery scan is SKIPPED;
  *   - INTERLEAVED keys (q392's mod-10 slices, hash-partitioned standing
  *     files spanning the full key range): the envelope can never prune,
  *     so its job is pure overhead at fixture file counts — the measured
  *     price of append detection, paid back at deployment file counts
  *     where discovery would otherwise open thousands of files.
  *
  * Each shape runs with the envelope ON (default) and OFF
  * (-Dgraft.mergeEnvelopeMinFiles override), so the envelope's cost and
  * savings are both direct measurements. Jobs are attributed by Spark
  * call site (collect at VersionedLayer.scala:NNN = envelope or
  * discovery; parquet at = stage write; head at = delta
  * materialization). Not part of the driver contract.
  *
  * Usage: runMain graft.CommitProfile */
object CommitProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.sources.{TempRoots, VersionedLayer}

    val jobStartNs = new ConcurrentHashMap[Int, (String, Long)]()
    val finished = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // properties is nullable (a job can carry none) — a bare getProperty
        // would NPE in the listener bus and silently drop the job's timing
        val props = Option(j.properties)
        val site = props.flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(props.flatMap(p => Option(p.getProperty("spark.job.description"))))
          .getOrElse(j.stageInfos.headOption.map(_.name).getOrElse("?"))
        jobStartNs.put(j.jobId, (site.take(60), System.nanoTime())); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobStartNs.remove(j.jobId)).foreach { case (site, t0) =>
          finished.add(site -> (System.nanoTime() - t0)); ()
        }
      }
    })

    def commitOnce(tag: String, keyLocal: Boolean, envelope: Boolean): Unit = {
      if (envelope) System.clearProperty("graft.mergeEnvelopeMinFiles")
      else System.setProperty("graft.mergeEnvelopeMinFiles", "1000000")
      val rootPath = java.nio.file.Files.createTempDirectory(s"graft_cprof_$tag")
      try {
        val standing =
          if (keyLocal) (0 until 320000).map(i => (i.toLong, s"v$i")).toDF("k", "s")
            .repartitionByRange(32, col("k")).sortWithinPartitions(col("k"))
          else (0 until 320000).map(i => (i.toLong, s"v$i")).toDF("k", "s")
            .repartition(32)
        VersionedLayer.write(standing, rootPath.toString)
        val delta =
          if (keyLocal) (320000 until 330000).map(i => (i.toLong, s"n$i")).toDF("k", "s")
          else (0 until 320000 by 32).map(i => (i.toLong, s"n$i")).toDF("k", "s")
        // settle, then profile exactly one serializable merge commit
        Thread.sleep(500); finished.clear()
        val t0 = System.nanoTime()
        VersionedLayer.mergeSerializable(delta, rootPath.toString, Seq("k"))
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        val jobs = finished.toArray(Array.empty[(String, Long)])
        println(f"[cprof] $tag%-28s envelope=${if (envelope) "on " else "off"} " +
          f"wall=$wall%6.2f s  jobs=${jobs.length}")
        jobs.groupBy(_._1).toSeq.sortBy(-_._2.map(_._2).sum).foreach { case (site, js) =>
          println(f"[cprof]   ${js.length}%2d x $site%-44s ${js.map(_._2).sum / 1e9}%6.2f s")
        }
      } finally {
        System.clearProperty("graft.mergeEnvelopeMinFiles")
        TempRoots.deleteRecursively(rootPath, swallow = true)
      }
    }

    // warm code paths once off the record
    commitOnce("warmup", keyLocal = true, envelope = true)
    println("[cprof] === profiled runs ===")
    // alternate on/off across two reps so in-JVM drift (JIT, GC pressure,
    // page cache) cannot masquerade as an envelope cost difference
    for (rep <- 1 to 2; env <- Seq(true, false)) {
      val _ = rep
      commitOnce("key_local_append", keyLocal = true, envelope = env)
      commitOnce("interleaved_update", keyLocal = false, envelope = env)
    }
    spark.stop()
  }
}
