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
}
