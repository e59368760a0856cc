package graft

import org.apache.spark.sql.DataFrame

/** Parallelism guard for narrow-but-CPU-heavy stages.
  *
  * Spark sizes scan partitions by BYTES (maxPartitionBytes), which is right
  * for I/O-bound scans and wrong for compute-bound rows: a 2 MB parquet
  * file whose rows each cost a millisecond of codec/hash work runs as ONE
  * task no matter how many cores exist. Profiled on this harness as
  * consecutive 1-task multi-second stages behind q52 (md5-per-gram) and the
  * image queries (encode/decode per row) — see BENCH/BASELINE.md round 4.
  *
  * `widen` repartitions only when the source has fewer partitions than the
  * cluster, so a well-partitioned 100 TB table pays nothing; the shuffle it
  * introduces on small sources moves the raw rows once (kilobytes) to buy
  * full-width execution of everything above.
  */
object ParUtil {
  def widen(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= par) df else df.repartition(par)
  }

  /** Free the executor blocks behind a (local)checkpoint'd DataFrame NOW.
    *
    * `Dataset.unpersist` consults only the SQL CacheManager, which never
    * holds checkpointed plans — on a checkpointed frame it is a silent
    * no-op (verified on Spark 4.1.2: blocks stay pinned until the GC +
    * ContextCleaner eventually reach the underlying RDD). Iterative
    * operators (kNN rounds, dedupGroups label propagation) need
    * deterministic per-round release, so this walks the analyzed plan to
    * the LogicalRDD and unpersists the RDD itself.
    *
    * CALL ONLY once nothing live still reads the frame: lineage is
    * truncated, so the blocks are the only copy. No-op for plans without a
    * LogicalRDD (e.g. a merely cached frame). */
  def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  /** The `SPARK_GRAFT_ONLY` query filter, ONE parse shared by Bench and
    * Verify so the contract cannot drift: comma-separated names, tokens
    * trimmed, blank counts as unset. */
  def onlyFilter: Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_ONLY").map(_.trim).filter(_.nonEmpty)
      .map(_.split(",").map(_.trim).toSet)
}
