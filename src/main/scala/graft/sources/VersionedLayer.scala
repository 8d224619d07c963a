package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, struct, when}

/** Dependency-free versioned table layer reproducing the Delta-format
  * semantics the reference actually relies on (`glue/etl_api.py:25,38,49`
  * persists every layer `format("delta")` with `mode("overwrite")`):
  * atomic full-snapshot overwrite — readers never observe a half-written
  * layer — plus version time travel and multi-writer commit arbitration.
  * (The offline build environment carries no Delta/Iceberg jars; this
  * reconstructs the reader-visible contract on plain parquet.)
  *
  * Layout under `root/`:
  *   - `v=N/`          parquet snapshot directories;
  *   - `_claims/N`     claim files — the arbitration log (who owns number N);
  *   - `_commits/N`    commit markers — the publication log. A version is
  *                     readable iff its commit marker exists; everything
  *                     else (`_staged-*`, claimed-but-unmarked `v=N`) is
  *                     invisible writer debris until [[vacuum]].
  *
  * Commit protocol (Delta-style optimistic arbitration, filesystem-only):
  *   1. stage: the writer materializes the snapshot COMPLETELY under a
  *      writer-unique scratch directory `root/_staged-<uuid>` — no two
  *      writers ever touch the same staging path;
  *   2. claim: it picks N = (highest claimed-or-committed) + 1 and tries to
  *      create `_claims/N` exclusively. Exclusive create is the
  *      filesystem's compare-and-swap — atomic on HDFS (the NameNode
  *      serializes namespace mutations) and on POSIX via O_EXCL (local
  *      filesystems go through `java.nio` precisely because the Hadoop
  *      local-FS shim's create is check-then-act, not atomic). Losing the
  *      race just advances N and retries the (cheap) claim — the snapshot
  *      itself is never rewritten;
  *   3. publish: owning N, the writer clears any uncommitted `v=N` debris a
  *      crashed predecessor left, renames its staging directory to `v=N`,
  *      and creates `_commits/N`. Both steps are uncontended — only ever
  *      executed by the unique claim winner of N.
  *
  * Consequences readers can rely on:
  *   - concurrent writers serialize: every commit gets a distinct version,
  *     and the highest committed marker is the published snapshot
  *     (blind-overwrite snapshots commute — the same answer Delta gives
  *     concurrent `mode("overwrite")` writers after its own retry loop);
  *   - a reader that resolved version N keeps reading N's immutable files
  *     even while N+1 lands (snapshot isolation);
  *   - a writer that dies at ANY step leaves the committed state — and
  *     every reader — untouched (atomicity): it leaves a `_staged-*`
  *     orphan, a dangling claim, or an unmarked `v=N`, all invisible;
  *   - old snapshots stay readable by version until [[vacuum]] (time travel).
  *
  * Honest scope notes: on object stores without atomic exclusive-create
  * (raw S3) the claim step needs a consistent store or a commit service —
  * the same deployment constraint every filesystem-log table format has.
  * [[vacuum]] must not run concurrently with writers (it may collect an
  * in-flight writer's debris) — the standard retention caveat. */
object VersionedLayer {

  private val MaxClaimAttempts = 1000

  private def conf(spark: SparkSession) = spark.sparkContext.hadoopConfiguration

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(conf(spark))

  private def claimDir(root: String) = new Path(root, "_claims")
  private def commitDir(root: String) = new Path(root, "_commits")

  private def listVersionFiles(f: FileSystem, d: Path): Seq[Long] =
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq.map(_.getPath.getName)
      .flatMap(n => scala.util.Try(n.toLong).toOption).sorted

  /** Exclusive create — the arbitration CAS. True = this writer owns the
    * file. HDFS `create(overwrite=false)` is namespace-atomic; the Hadoop
    * local shim's is check-then-act, so local paths use O_EXCL via nio. */
  private def createExclusive(f: FileSystem, p: Path): Boolean =
    try {
      f match {
        case _: LocalFileSystem | _: RawLocalFileSystem =>
          java.nio.file.Files.createFile(java.nio.file.Paths.get(p.toUri.getPath))
        case _ =>
          f.create(p, false).close()
      }
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
    }

  /** Committed versions in ascending order — the publication log. */
  def committedVersions(spark: SparkSession, root: String): Seq[Long] =
    listVersionFiles(fs(spark, root), commitDir(root))

  /** Currently published version, if any write ever committed. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    committedVersions(spark, root).lastOption

  /** All snapshot versions present on disk (committed or not — uncommitted
    * ones are crashed/in-flight writers' claims, invisible to [[read]]). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val r = new Path(root)
    if (!f.exists(r)) Seq.empty
    else f.listStatus(r).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.drop(2).toLong).sorted
  }

  /** Atomic full-snapshot overwrite: write `df` as the next version and
    * publish it. Returns the committed version number. Safe under writer
    * crashes (debris stays invisible; a retry claims the next free number)
    * and under concurrent writers (the claim CAS arbitrates — see the
    * commit protocol above). */
  def write(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val staged = new Path(root, s"_staged-${UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(staged.toString)
    f.mkdirs(claimDir(root))
    def nextFree: Long =
      (listVersionFiles(f, claimDir(root)) ++ listVersionFiles(f, commitDir(root)))
        .maxOption.getOrElse(0L) + 1
    var n = nextFree
    var attempts = 0
    while (!createExclusive(f, new Path(claimDir(root), n.toString))) {
      attempts += 1
      if (attempts >= MaxClaimAttempts)
        throw new IllegalStateException(
          s"could not claim a version under $root after $MaxClaimAttempts attempts")
      n = math.max(nextFree, n + 1)
    }
    // publish: this writer is the unique owner of n from here on
    val dest = new Path(root, s"v=$n")
    if (f.exists(dest)) f.delete(dest, true) // a crashed predecessor's unmarked debris
    if (!f.rename(staged, dest))
      throw new IllegalStateException(s"failed to move $staged to $dest")
    f.mkdirs(commitDir(root))
    f.create(new Path(commitDir(root), n.toString), false).close()
    n
  }

  /** Keyed upsert (MERGE semantics, whole-row update): publish a new
    * version holding `delta`'s rows plus every published row whose key is
    * absent from `delta` — matched keys take the delta row, unmatched delta
    * keys insert. A missing/empty layer makes the delta the first snapshot.
    * Returns the committed version.
    *
    * Scale shape: ONE wide operation — the left-anti join of the (100 TB)
    * base against the delta's keys; a small delta broadcasts (AQE decides),
    * so the common incremental-load case never shuffles the base. The new
    * snapshot is staged completely before the claim CAS, so readers keep
    * snapshot isolation and crashes leave only invisible debris, exactly as
    * [[write]].
    *
    * Concurrency contract: version arbitration still serializes writers
    * onto distinct versions, but merge derives its snapshot from the
    * version it READ — two simultaneous mergers both reading N would each
    * publish a child of N and the later one silently drops the earlier
    * delta (the lost-update anomaly Delta detects with its conflict
    * checker). Run one merger at a time per layer — or use
    * [[mergeSerializable]], which adds Delta's conflict-detection retry
    * loop and makes racing mergers serializable; concurrent blind
    * [[write]] overwrites remain safe either way. */
  def merge(delta: DataFrame, root: String, keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val spark = delta.sparkSession
    val snapshot = latestVersion(spark, root) match {
      case None => delta
      case Some(v) =>
        val base = read(spark, root, Some(v))
        // allowMissingColumns = additive schema evolution (Delta's
        // mergeSchema): a column new in the delta widens the table with
        // nulls for pre-existing rows; a column the delta dropped arrives
        // null on the delta's rows. Key columns are always present on both
        // sides (the anti-join requires them), so keys never null-fill.
        delta.unionByName(base.join(delta.select(keyCols.map(delta(_)): _*)
          .dropDuplicates(keyCols), keyCols, "left_anti"),
          allowMissingColumns = true)
    }
    write(snapshot, root)
  }

  /** [[merge]] with Delta's optimistic-concurrency discipline on top: the
    * lost-update anomaly documented on [[merge]] (two mergers reading the
    * same base each publish a child of it; the later commit silently drops
    * the earlier delta) is eliminated by pinning the commit NUMBER to the
    * base: a serializable merge may only publish version base+1. The claim
    * CAS then arbitrates conflicting mergers directly — exactly one writer
    * per version number — and the loser RE-READS the (now advanced) base,
    * re-derives its snapshot so the winner's rows are included, and retries
    * against the new base+1. Versions therefore commit densely and in
    * order, which is what makes "my base is the latest commit" a
    * serializability proof: when this writer owns claim base+1 and base is
    * the newest commit marker, no unseen merge can ever slot between them.
    *
    * Liveness is bounded, not unconditional (the same trade every
    * filesystem-log format makes): a claim owner that died before
    * publishing holds base+1 hostage, so losers wait `waitMs` per attempt
    * for the marker to appear and give up after `maxRetries` with a
    * diagnosis naming the dangling claim ([[vacuum]] collects it). Each
    * retry re-stages the derived snapshot — the price of deriving from a
    * moved base; the delta itself is never recomputed (cache it upstream
    * if it is expensive).
    *
    * Concurrent [[mergeSerializable]] callers with commuting deltas all
    * land (asserted in VersionedLayerSpec with racing threads); mixing in
    * concurrent blind [[write]]s keeps every snapshot well-formed but a
    * blind overwrite that wins the race supersedes earlier merges by
    * design (it is later in the serial order and replaces the table). */
  def mergeSerializable(delta: DataFrame, root: String, keyCols: Seq[String],
                        maxRetries: Int = 30, waitMs: Long = 200): Long = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val spark = delta.sparkSession
    val f = fs(spark, root)
    var attempts = 0
    while (attempts < maxRetries) {
      val base = latestVersion(spark, root)
      val snapshot = base match {
        case None => delta
        case Some(v) =>
          val b = read(spark, root, Some(v))
          delta.unionByName(b.join(delta.select(keyCols.map(delta(_)): _*)
            .dropDuplicates(keyCols), keyCols, "left_anti"),
            allowMissingColumns = true)
      }
      val n = base.getOrElse(0L) + 1
      val staged = new Path(root, s"_staged-${UUID.randomUUID()}")
      snapshot.write.mode("overwrite").parquet(staged.toString)
      f.mkdirs(claimDir(root))
      if (createExclusive(f, new Path(claimDir(root), n.toString))) {
        val dest = new Path(root, s"v=$n")
        if (f.exists(dest)) f.delete(dest, true)
        if (!f.rename(staged, dest))
          throw new IllegalStateException(s"failed to move $staged to $dest")
        f.mkdirs(commitDir(root))
        f.create(new Path(commitDir(root), n.toString), false).close()
        return n
      }
      // lost the claim: another writer owns base+1. Drop our stale staging,
      // give the winner a beat to publish, re-derive from the moved base.
      f.delete(staged, true)
      if (latestVersion(spark, root).getOrElse(0L) < n) Thread.sleep(waitMs)
      attempts += 1
    }
    throw new IllegalStateException(
      s"mergeSerializable lost the commit race $maxRetries times under $root; " +
        s"if no concurrent writer is live, a crashed writer's dangling claim " +
        s"${latestVersion(spark, root).getOrElse(0L) + 1} is blocking the log — vacuum reclaims it")
  }

  /** Exactly-once-EFFECT Structured Streaming sink: merge each micro-batch
    * into the layer and skip batch ids the layer already absorbed — Delta's
    * `txnAppId`/`txnVersion` idempotent-writer pattern rebuilt on this
    * layer's log. Use as
    * `stream.writeStream.foreachBatch(VersionedLayer.idempotentMergeBatch(root, keys, appId) _)`.
    *
    * Replay protection: a marker `_txn/<appId>-<batchId>` is exclusively
    * created AFTER the merge commits, so the crash window (merge committed,
    * marker missing) re-applies the merge on restart — harmless, because
    * re-merging the identical delta is content-idempotent (the snapshot at
    * a duplicate version is byte-equal; asserted in the spec). Marker-first
    * would instead DROP a batch when the crash lands between marker and
    * merge — the unrecoverable side of the trade. Markers are per `appId`:
    * distinct streams into one layer keep independent replay cursors.
    * [[vacuum]] leaves `_txn` untouched (retention of replay cursors must
    * outlive snapshot retention — a restarted query may replay a batch
    * older than the oldest kept snapshot). */
  def idempotentMergeBatch(root: String, keyCols: Seq[String], appId: String)
                          (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val f = fs(spark, root)
    val marker = new Path(new Path(root, "_txn"), s"$appId-$batchId")
    if (!f.exists(marker)) {
      mergeSerializable(batch, root, keyCols)
      f.mkdirs(new Path(root, "_txn"))
      createExclusive(f, marker) // a racing replica's loss means it already marked
      ()
    }
  }

  /** Compact the published snapshot into `targetFiles` parquet files and
    * publish the rewrite as a NEW version (contents identical — asserted in
    * the spec; prior versions stay time-travelable until [[vacuum]]). The
    * small-file problem is operational reality at scale: a day of
    * incremental merges leaves thousands of files whose per-file open/footer
    * cost dominates scans; compaction trades one rewrite for every future
    * read. `coalesce` (not `repartition`) — narrowing file count must not
    * shuffle the data. */
  def compact(spark: SparkSession, root: String, targetFiles: Int = 1): Long =
    write(read(spark, root).coalesce(math.max(targetFiles, 1)), root)

  /** Snapshot diff — change-data-capture BETWEEN committed versions, the
    * reader-side analogue of Delta's change data feed reconstructed from
    * plain snapshots: one full-outer join of the two versions on `keyCols`
    * classifies every key as `insert` (only in `to`), `delete` (only in
    * `from`), or `update` (both, any non-key column changed; unchanged rows
    * are dropped). Returns the `to`-side row for inserts/updates and the
    * `from`-side row for deletes, with a `_change` column.
    *
    * Change detection compares the full row structs — null-safe (`<=>`), so
    * null→value and value→null transitions register as updates. Scale: ONE
    * shuffled equi-join on the key (both snapshots partition on it); at
    * 100 TB a log-based CDF is cheaper when available, but snapshot diff is
    * the tool that works on ANY two versions — including across a vacuum
    * gap or after a blind overwrite, where a change log has no lineage. */
  def diff(spark: SparkSession, root: String, fromV: Long, toV: Long,
           keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    val from = read(spark, root, Some(fromV))
    val to = read(spark, root, Some(toV))
    require(from.columns.sorted.sameElements(to.columns.sorted),
      s"schema changed between v$fromV and v$toV; diff requires aligned columns")
    val cols = from.columns.toSeq
    val f = from.select(keyCols.map(col) :+ struct(cols.map(col): _*).as("_f"): _*)
    val t = to.select(keyCols.map(col) :+ struct(cols.map(col): _*).as("_t"): _*)
    f.join(t, keyCols, "full_outer")
      .withColumn("_change",
        when(col("_f").isNull, lit("insert"))
          .when(col("_t").isNull, lit("delete"))
          .when(!(col("_f") <=> col("_t")), lit("update")))
      .filter(col("_change").isNotNull)
      .select(coalesce(col("_t"), col("_f")).as("_row"), col("_change"))
      .select(cols.map(c => col(s"_row.$c")) :+ col("_change"): _*)
  }

  /** Data files of a committed version (for file-count/size accounting). */
  def dataFiles(spark: SparkSession, root: String, version: Long): Seq[String] = {
    val f = fs(spark, root)
    f.listStatus(new Path(root, s"v=$version")).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
  }

  /** Read the published snapshot, or a specific committed version (time
    * travel). Uncommitted `v=N` debris is not readable. */
  def read(spark: SparkSession, root: String, version: Option[Long] = None): DataFrame = {
    val committed = committedVersions(spark, root)
    val v = version match {
      case Some(x) =>
        if (!committed.contains(x))
          throw new IllegalStateException(s"version $x is not committed under $root")
        x
      case None => committed.lastOption.getOrElse(
        throw new IllegalStateException(s"no published version under $root"))
    }
    spark.read.parquet(s"$root/v=$v")
  }

  /** Drop all snapshots older than the `keepLast` most recent committed
    * versions (never the published one), their claim/commit log entries,
    * and writer debris — staged directories and unmarked claims. Time
    * travel to vacuumed versions stops working, and vacuum must not run
    * concurrently with writers — same contract as Delta's VACUUM. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int = 1): Unit = {
    val f = fs(spark, root)
    val keep = committedVersions(spark, root).takeRight(math.max(keepLast, 1)).toSet
    for (v <- versions(spark, root) if !keep.contains(v))
      f.delete(new Path(root, s"v=$v"), true)
    for (d <- Seq(claimDir(root), commitDir(root)); v <- listVersionFiles(f, d)
         if !keep.contains(v))
      f.delete(new Path(d, v.toString), false)
    val r = new Path(root)
    if (f.exists(r))
      for (st <- f.listStatus(r) if st.getPath.getName.startsWith("_staged-"))
        f.delete(st.getPath, true)
  }
}
