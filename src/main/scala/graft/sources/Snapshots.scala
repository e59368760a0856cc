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
  * Commit protocol: data + metadata parquet are written first, then the
  * CURRENT pointer is moved with an atomic rename — a crashed run leaves the
  * previous snapshot intact. Resume = read CURRENT, skip partitions already
  * recorded for that snapshot (north_rule: "resumable from checkpoint with
  * per-partition lineage + metrics").
  */
object Snapshots {

  final case class PartitionMeta(snapshotId: Long, partId: Int, rowCount: Long, lineageHash: Long)

  private def metaDir(table: String) = s"$table/_meta"
  private def currentPath(table: String): Path = Paths.get(metaDir(table), "CURRENT")

  def currentSnapshot(table: String): Option[Long] = {
    val p = currentPath(table)
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** Partitions already committed for snapshot `sid` (resume set). */
  def committedPartitions(spark: SparkSession, table: String, sid: Long): Set[Int] = {
    val dir = s"${metaDir(table)}/partitions"
    if (!Files.exists(Paths.get(dir))) Set.empty
    else spark.read.parquet(dir)
      .where(col("snapshot_id") === sid)
      .select("part_id").collect().map(_.getInt(0)).toSet
  }

  /** Write `df` bucketed into `nParts` logical partitions with per-partition
    * lineage rows; skips partitions already committed for this snapshot id
    * (idempotent resume). Returns per-partition metadata. */
  def writeSnapshot(
      spark: SparkSession, df: DataFrame, table: String,
      snapshotId: Long, nParts: Int, keyCol: String,
      operation: String = "append"): Seq[PartitionMeta] = {
    import spark.implicits._
    val done = committedPartitions(spark, table, snapshotId)
    val withPart = df.withColumn("part_id", pmod(hash(col(keyCol)), lit(nParts)).cast("int"))

    val metas = (0 until nParts).filterNot(done.contains).map { pid =>
      val part = withPart.where(col("part_id") === pid).drop("part_id").cache()
      val rows = part.count()
      // lineage hash: order-independent xor-ish aggregate of row hashes
      val lhash =
        if (rows == 0) 0L
        else part.select(sum(hash(struct(part.columns.map(col): _*)).cast("long")).as("h"))
          .collect()(0).getLong(0)
      part.write.mode(SaveMode.Overwrite).parquet(s"$table/data/part_id=$pid")
      part.unpersist()
      // commit this partition's lineage row immediately (resumable mid-run)
      Seq(PartitionMeta(snapshotId, pid, rows, lhash)).toDF(
        "snapshot_id", "part_id", "row_count", "lineage_hash")
        .write.mode(SaveMode.Append).parquet(s"${metaDir(table)}/partitions")
      PartitionMeta(snapshotId, pid, rows, lhash)
    }

    // snapshot manifest + atomic CURRENT pointer flip
    Seq((snapshotId, java.time.Instant.now.toString, operation, nParts))
      .toDF("snapshot_id", "ts", "operation", "n_partitions")
      .write.mode(SaveMode.Append).parquet(s"${metaDir(table)}/snapshots")
    val tmp = Paths.get(metaDir(table), s".CURRENT.tmp.$snapshotId")
    Files.createDirectories(tmp.getParent)
    Files.writeString(tmp, snapshotId.toString)
    Files.move(tmp, currentPath(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    metas
  }

  def readSnapshots(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"${metaDir(table)}/snapshots")

  def readPartitionMeta(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"${metaDir(table)}/partitions")

  def readData(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"$table/data")
}
