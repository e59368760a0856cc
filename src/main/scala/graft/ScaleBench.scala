package graft

import org.apache.spark.sql.SparkSession

/** N -> 4N scaling-efficiency evidence (north_rule; sandbox substitute per
  * BASELINE.md: the same job + input at local[8] vs local[32]).
  *
  * Protocol: prepare the input once; one unrecorded warmup run (JIT);
  * then best-of-two measured runs per core count, interleaved so JIT favors
  * neither configuration. Prints one JSON line with throughputs and
  * efficiency = (rps32 / rps8) / 4.
  *
  * Usage: ScaleBench <sfDir> <workDir>
  */
object ScaleBench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scale-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
  }

  /** One measured pipeline run at `cores`; returns (seconds, images/sec). */
  private def timed(cores: Int, work: String): (Double, Double) = {
    val spark = session(cores)
    try {
      rm(new java.io.File(s"$work/tile_stats"))
      val t0 = System.nanoTime()
      val (_, n) = Pipeline.run(spark, work)
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, n / sec)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val work = if (args.length > 1) args(1) else "/tmp/graft-scale"
    // large enough that parallel work dwarfs fixed job overheads
    val nImages = if (args.length > 2) args(2).toLong else 1500000L
    val nCores = if (args.length > 3) args(3).toInt else 8
    val n4Cores = nCores * 4

    val prep = session(32)
    try {
      if (!new java.io.File(s"$work/images").exists())
        Pipeline.prepareN(prep, nImages, sfDir, work)
    } finally prep.stop()

    timed(nCores, work) // warmup, unrecorded
    var bestN = Double.MaxValue; var rpsN = 0.0
    var best4N = Double.MaxValue; var rps4N = 0.0
    for (_ <- 1 to 2) {
      val (sN, rN) = timed(nCores, work)
      if (sN < bestN) { bestN = sN; rpsN = rN }
      val (s4N, r4N) = timed(n4Cores, work)
      if (s4N < best4N) { best4N = s4N; rps4N = r4N }
    }
    val eff = (rps4N / rpsN) / 4.0
    println(f"""{"job":"spatial-join+tile-assign","sf":"$sfDir","n_cores":$nCores,"sec_N":$bestN%.3f,"rps_N":$rpsN%.1f,"sec_4N":$best4N%.3f,"rps_4N":$rps4N%.1f,"scaling_efficiency_N_to_4N":$eff%.3f}""")
  }
}
