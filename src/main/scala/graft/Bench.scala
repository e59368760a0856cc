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

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) -1.0
    else if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // measured passes (median reported). Default 3: two consecutive rounds
    // the single-sample driver artifact misstated performance 2-6x through a
    // host-contention window (r3 q38-q40, r4 q14+q47-q52) and had to be
    // adjudicated by reproduction; a median-of-3 with a spread map makes the
    // authoritative artifact self-certifying at ~2 extra minutes of bench.
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt)
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

    // optional filter for targeted timing runs (shared parse: ParUtil)
    val only = ParUtil.onlyFilter
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1).filter(q => wanted(q._1))

    // UNMEASURED warmup pass over every query at the smallest SF: one cheap
    // execution per query JIT/codegen-warms every code path — including the
    // JPEG/PNG codec stack behind q38/q43/q47, whose first-in-a-fresh-JVM
    // execution is what produced the round-3 driver-artifact spike (q38
    // 24 s vs 4.7 s for identical code). Kept separate from the measured
    // runs below: what's reported is the steady-state per-run cost a
    // long-lived cluster job pays, same warm protocol as ScaleBench.
    val warmDir = "/root/testdata/sf0.001"
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0" &&
        new java.io.File(warmDir).isDirectory) {
      sorted.foreach { case (name, fn) =>
        // NonFatal only: an OOM/LinkageError here leaves a corrupted JVM —
        // measurements from it would be silently garbage, so let it kill
        // the run instead
        try force(fn(spark, warmDir))
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] warmup $name: ${e.getMessage}") }
      }
    }

    // flagship pipeline: prepare once + ONE unmeasured warmup run before
    // the measured runs (without it the first run's JIT/codegen state
    // depends on whether the prepared input survived in /tmp, which is why
    // early rounds measured anywhere between 9 and 19 s for identical code)
    val work = s"/tmp/graft-bench-${sfDir.replaceAll("[^0-9.a-z]", "")}"
    var pipelineReady = false
    if (wanted("pipeline")) try {
      // images_count.txt is written last — its presence proves a COMPLETE
      // prepared table (a crashed prepare leaves the bare images dir)
      if (!new java.io.File(s"$work/images_count.txt").exists())
        Pipeline.prepare(spark, sfDir, work)
      FsUtil.rmTree(s"$work/tile_stats")
      Pipeline.run(spark, work) // warmup, unrecorded
      pipelineReady = true
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] pipeline prepare/warmup failed: ${e.getMessage}")
    }

    // measured passes: per-query median over `runs` (clean output table per
    // pass so every pass does full work)
    val samples = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    def record(name: String, sec: Double): Unit =
      samples(name) = samples.getOrElse(name, Vector.empty) :+ sec
    var pipelineRpsSamples = Vector.empty[Double]
    for (_ <- 1 to runs) {
      // clean cache slate per pass: queries that persist intermediates
      // (ANN index, dedup masks, kNN cells) would otherwise stay resident
      // across passes and tax every later measurement with their GC
      // footprint — measured: pipeline 3.5 s on a fresh JVM vs 6.4 s as
      // pass 2 behind ~45 queries' accumulated caches. Each query is
      // charged its own materialization cost, every pass.
      spark.catalog.clearCache()
      if (wanted("pipeline")) {
        if (pipelineReady) try {
          FsUtil.rmTree(s"$work/tile_stats")
          val t0 = System.nanoTime()
          val (_, n) = Pipeline.run(spark, work)
          val sec = (System.nanoTime() - t0) / 1e9
          record("pipeline", sec)
          pipelineRpsSamples :+= n / sec
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] pipeline failed: ${e.getMessage}")
            record("pipeline", -1.0)
        } else record("pipeline", -1.0)
      }
      sorted.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          force(fn(spark, sfDir))
          record(name, (System.nanoTime() - t0) / 1e9)
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            record(name, -1.0)
        }
      }
    }

    val results = samples.map { case (k, v) => k -> median(v.filter(_ >= 0)) }
    val pipelineRps = median(pipelineRpsSamples).max(0.0)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // per-query spread (max - min over the successful samples) documents
    // run-to-run variance; always emitted so the artifact certifies its own
    // stability. Failed passes are excluded from median/spread but counted
    // in "failures" (a query green 1-of-3 would otherwise report its single
    // success with spread 0, hiding flakiness). Extra keys are ignored by
    // the driver parser.
    val sp = samples.map { case (k, v) =>
      val ok = v.filter(_ >= 0)
      "\"" + k + "\":" + f"${if (ok.isEmpty) -1.0 else ok.max - ok.min}%.3f"
    }.mkString("{", ",", "}")
    val failed = samples.collect { case (k, v) if v.exists(_ < 0) =>
      "\"" + k + "\":" + v.count(_ < 0)
    }.mkString("{", ",", "}")
    val extra = s""","runs":$runs,"spread":$sp,"failures":$failed"""
    val json = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"pipeline_rows_per_sec":$pipelineRps%.1f$extra}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.json"), json + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    println(json)
    System.out.flush()
  }
}
