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

    val prep = session(32)
    try {
      if (!new java.io.File(s"$work/images").exists())
        Pipeline.prepareN(prep, nImages, sfDir, work)
    } finally prep.stop()

    timed(8, work) // warmup, unrecorded
    var best8 = Double.MaxValue; var rps8 = 0.0
    var best32 = Double.MaxValue; var rps32 = 0.0
    for (_ <- 1 to 2) {
      val (s8, r8) = timed(8, work)
      if (s8 < best8) { best8 = s8; rps8 = r8 }
      val (s32, r32) = timed(32, work)
      if (s32 < best32) { best32 = s32; rps32 = r32 }
    }
    val eff = (rps32 / rps8) / 4.0
    println(f"""{"job":"spatial-join+tile-assign","sf":"$sfDir","sec_8":$best8%.3f,"rps_8":$rps8%.1f,"sec_32":$best32%.3f,"rps_32":$rps32%.1f,"scaling_efficiency_8_to_32":$eff%.3f}""")
  }
}
