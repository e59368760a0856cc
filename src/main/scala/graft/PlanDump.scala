package graft

import org.apache.spark.sql.SparkSession

/** Plan-evidence dumper for the optimization rounds (guide §1: capture
  * `.explain("formatted")` for every declared query before/after a change).
  * NOT part of the measurement harness — Bench.scala is frozen; this main
  * only writes `plans/<tag>/<query>_<suffix>.txt`.
  *
  * Usage: SPARK_GRAFT_PLAN_TAG=r06 SPARK_GRAFT_PLAN_SUFFIX=before \
  *          sbt "runMain graft.PlanDump"
  * Respects SPARK_GRAFT_ONLY for targeted dumps. Note q42/q55/q16/q41
  * execute their embedded preparation actions (snapshot writes, hot-cell
  * probe, centroid sample) while the plan is being built — the dump pays
  * those, which is why it is a separate main and never timed.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r06")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val only = ParUtil.onlyFilter
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)

    SparkEntry.queries.toSeq.sortBy(_._1).filter(q => wanted(q._1)).foreach {
      case (name, fn) =>
        spark.catalog.clearCache()
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(dir.resolve(s"${name}_$suffix.txt"), plan)
          println(s"[plandump] $name ok")
        } catch {
          case scala.util.control.NonFatal(e) =>
            println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
    }
    spark.stop()
  }
}
