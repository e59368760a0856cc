package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpointed partition lineage with Iceberg-shaped semantics, emulated on
  * Parquet (no Iceberg jar ships in this environment — SURVEY.md §7.6):
  *
  *   table/
  *     data/part_id=N/...parquet        -- one directory per logical partition
  *     _meta/snapshots/...parquet       -- snapshot_id, ts, operation, n_partitions
  *     _meta/partitions/...parquet      -- snapshot_id, part_id, row_count, lineage_hash
  *     _meta/CURRENT                    -- atomically-renamed pointer file
  *
  * Commit protocol: data + partition lineage are written first, then the
  * one-row manifest is PUBLISHED with an atomic no-replace rename (see
  * [[ensureManifest]] — exactly one winner under concurrent committers),
  * then the CURRENT pointer is moved with an atomic rename — a crashed run
  * leaves the previous snapshot intact. Resume = read CURRENT, skip
  * partitions already recorded for that snapshot (north_rule: "resumable
  * from checkpoint with per-partition lineage + metrics"). Concurrent DATA
  * writes to one snapshot stay single-writer (documented in
  * [[ensureManifest]]); the metadata commit itself is race-safe.
  */
object Snapshots {

  final case class PartitionMeta(snapshotId: Long, partId: Int, rowCount: Long, lineageHash: Long)

  private def metaDir(table: String) = s"$table/_meta"
  private def currentPath(table: String): Path = Paths.get(metaDir(table), "CURRENT")

  def currentSnapshot(table: String): Option[Long] = {
    val p = currentPath(table)
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** Per-partition metadata already committed for snapshot `sid` (resume
    * set). Deduplicated by part_id so a crash-then-resume that produced a
    * duplicate lineage row can never double-count. */
  def committedMetas(spark: SparkSession, table: String, sid: Long): Seq[PartitionMeta] = {
    val dir = s"${metaDir(table)}/partitions"
    if (!Files.exists(Paths.get(dir))) Seq.empty
    else spark.read.parquet(dir)
      .where(col("snapshot_id") === sid)
      .dropDuplicates("part_id")
      .collect()
      .map(r => PartitionMeta(sid, r.getAs[Int]("part_id"),
        r.getAs[Long]("row_count"), r.getAs[Long]("lineage_hash"))).toSeq
  }

  /** Partitions already committed for snapshot `sid` (resume set). */
  def committedPartitions(spark: SparkSession, table: String, sid: Long): Set[Int] =
    committedMetas(spark, table, sid).map(_.partId).toSet

  /** Write `df` bucketed into `nParts` logical partitions with per-partition
    * lineage rows; skips partitions already committed for this snapshot id
    * (idempotent resume). Returns per-partition metadata for the WHOLE
    * snapshot — previously committed partitions included — so every resume
    * path (fresh, partial, no-op) reports the same total row count.
    *
    * `portableParts`: partition by `keyCol % nParts` on the (numeric) key
    * instead of Spark's murmur hash — lets an external SQL oracle recompute
    * the partition assignment verbatim (q42 evidence path).
    * `maxPartsPerRun`: commit at most this many still-pending partitions,
    * then stop WITHOUT flipping the CURRENT pointer or writing the
    * manifest row — a micro-batch commit that doubles as a deterministic
    * mid-snapshot-crash simulation (the snapshot only becomes current once
    * every partition's lineage row exists). */
  def writeSnapshot(
      spark: SparkSession, df: DataFrame, table: String,
      snapshotId: Long, nParts: Int, keyCol: String,
      operation: String = "append",
      portableParts: Boolean = false,
      maxPartsPerRun: Int = Int.MaxValue): Seq[PartitionMeta] = {
    import spark.implicits._
    val committed = committedMetas(spark, table, snapshotId)
    val done = committed.map(_.partId).toSet
    val pendingAll = (0 until nParts).filterNot(done.contains)
    if (pendingAll.isEmpty) {
      // a crash can land AFTER the last lineage append but BEFORE the
      // manifest write — the resume must still complete the commit fully
      ensureManifest(spark, table, snapshotId, operation, nParts)
      ensureCurrent(table, snapshotId)
      return committed
    }
    val pending = pendingAll.take(maxPartsPerRun)
    val partialRun = pending.length < pendingAll.length

    // one data job + one stats job, NOT a job per partition: the driver-side
    // loop would serialize nParts small jobs and wreck N->4N scaling
    // efficiency (Amdahl). Dynamic partition overwrite keeps resume safe: a
    // crashed run's partially-written partitions are simply rewritten, and
    // already-committed partitions are filtered out up front.
    val partExpr =
      if (portableParts) pmod(col(keyCol).cast("long"), lit(nParts.toLong)).cast("int")
      else pmod(hash(col(keyCol)), lit(nParts)).cast("int")
    val withPart = df.withColumn("part_id", partExpr)
    val filtered = (if (pending.length == nParts) withPart
                    else withPart.where(col("part_id").isin(pending: _*))).persist()

    val dataCols = df.columns
    // co-locate each logical partition into ONE writer task: without this,
    // every upstream task writes a file per part_id it sees (cores x nParts
    // small files + commit objects — the file churn was 2-3 s of fixed wall
    // per snapshot at 32 cores on tiny outputs). One file per partition,
    // deterministic layout. At 100 TB output scale, add a salt column to
    // the repartition key to widen write parallelism within a partition.
    filtered.repartition(nParts, col("part_id"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("part_id")
      .parquet(s"$table/data")

    // per-partition row counts + order-independent lineage hashes in one agg
    val stats = filtered
      .groupBy("part_id")
      .agg(count(lit(1)).as("rows"),
        sum(hash(dataCols.map(col): _*).cast("long")).as("lhash"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    filtered.unpersist()

    val metas = pending.map { pid =>
      val (rows, lhash) = stats.getOrElse(pid, (0L, 0L))
      PartitionMeta(snapshotId, pid, rows, lhash)
    }
    metas.map(m => (m.snapshotId, m.partId, m.rowCount, m.lineageHash))
      .toDF("snapshot_id", "part_id", "row_count", "lineage_hash")
      .write.mode(SaveMode.Append).parquet(s"${metaDir(table)}/partitions")
    // a partial (micro-batch / crash-simulation) run stops here: no
    // manifest row, no CURRENT flip — the snapshot is not yet complete
    if (partialRun) return committed ++ metas

    ensureManifest(spark, table, snapshotId, operation, nParts)
    ensureCurrent(table, snapshotId)
    committed ++ metas
  }

  /** Publish the snapshot's manifest row exactly once — the COMMIT point of
    * the protocol, made safe for CONCURRENT committers of the same snapshot
    * (the Iceberg semantics being emulated are precisely about this):
    *
    *   1. the committer CLAIMS the snapshot with an atomic
    *      `Files.createFile` of a dot-prefixed lock — a racing loser stops
    *      as soon as the winner's file is published (in the narrow window
    *      where the winner holds the lock but has not yet published, the
    *      loser falls through — publishing is idempotent and the atomic
    *      replace below still leaves exactly one valid file);
    *   2. the winner writes the one-row manifest as a parquet file in a
    *      hidden temp dir (dot-prefixed paths are invisible to parquet
    *      readers), then
    *   3. publishes it into `_meta/snapshots/manifest-<sid>.parquet` with a
    *      same-directory ATOMIC_MOVE — readers can never observe a
    *      half-written file, and the manifest can never hold two rows for
    *      one snapshot.
    *
    * A crash between steps leaves a lock with no published target; the next
    * (sequential) resume detects that and completes the publish. Concurrent DATA writes for the
    * same snapshot remain single-writer-per-snapshot territory — two
    * writers racing the same `data/part_id=N` directories is undefined, as
    * it is for any filesystem table format without a catalog lock; the
    * crash-then-RESUME path (sequential) is fully safe and q42-proven. */
  private[graft] def ensureManifest(spark: SparkSession, table: String, snapshotId: Long,
                                      operation: String, nParts: Int): Unit = {
    import spark.implicits._
    val snapDir = Paths.get(s"${metaDir(table)}/snapshots")
    val target = snapDir.resolve(s"manifest-$snapshotId.parquet")
    if (Files.exists(target)) return
    // legacy tables (pre-CAS layout) appended part-*.parquet rows: honor
    // them so a resume on an old table does not duplicate the manifest row
    val hasLegacyParts = Files.exists(snapDir) && {
      val s = Files.list(snapDir)
      try s.anyMatch(p => !p.getFileName.toString.startsWith("manifest-"))
      finally s.close()
    }
    if (hasLegacyParts &&
        !readSnapshots(spark, table).where(col("snapshot_id") === snapshotId).isEmpty) return

    // claim FIRST with an atomic dot-file create (invisible to parquet
    // readers): losers of a live race stop here without even paying the
    // temp write. A lock with no published target means the claimant
    // crashed mid-publish — the (sequential, documented) resume falls
    // through and publishes.
    Files.createDirectories(snapDir)
    val lock = snapDir.resolve(s".manifest-$snapshotId.lock")
    try Files.createFile(lock)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        if (Files.exists(target)) return // already published by the winner
    }
    val tmpDir = Paths.get(metaDir(table), s".tmp-manifest-$snapshotId-${java.util.UUID.randomUUID}")
    Seq((snapshotId, java.time.Instant.now.toString, operation, nParts))
      .toDF("snapshot_id", "ts", "operation", "n_partitions")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmpDir.toString)
    val partFile = {
      val s = Files.list(tmpDir)
      try s.filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      finally s.close()
    }
    // same-directory ATOMIC_MOVE (tmp lives under _meta, snapshots under
    // _meta — one filesystem by construction): readers can never observe a
    // half-written manifest. Replace semantics only matter in the
    // crashed-claimant resume path above, where the replacement row is the
    // same snapshot's.
    try Files.move(partFile, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    finally {
      val s = Files.list(tmpDir)
      try s.forEach(p => Files.deleteIfExists(p)) finally s.close()
      Files.deleteIfExists(tmpDir)
    }
  }

  /** Atomic CURRENT pointer flip (idempotent). */
  private def ensureCurrent(table: String, snapshotId: Long): Unit = {
    if (currentSnapshot(table).contains(snapshotId)) return
    val tmp = Paths.get(metaDir(table), s".CURRENT.tmp.$snapshotId")
    Files.createDirectories(tmp.getParent)
    Files.writeString(tmp, snapshotId.toString)
    Files.move(tmp, currentPath(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def readSnapshots(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"${metaDir(table)}/snapshots")

  def readPartitionMeta(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"${metaDir(table)}/partitions")

  def readData(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"$table/data")
}
