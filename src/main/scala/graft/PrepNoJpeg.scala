package graft

import graft.functions.GraftFunctions._
import graft.sources.SynthData
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

object PrepNoJpeg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val n = args(0).toLong
    val work = args(1)
    val imgs = SynthData.imagesN(spark, n)
      .withColumn("fmt", element_at(array(lit("png"), lit("bmp")), (col("point_id") % 2 + 1).cast("int")))
      .withColumn("bytes", image_synth(struct(col("image_id"), col("w"), col("h"), col("fmt"))))
      .withColumn("footprint_wkt", st_point_wkt(col("lon"), col("lat"), 16))
      .select("image_id", "point_id", "bytes", "w", "h", "fmt", "caption", "phash", "footprint_wkt")
    imgs.repartition(64).write.mode(SaveMode.Overwrite).parquet(s"$work/images")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$work/images_count.txt"), n.toString)
    SynthData.polygons(spark, "/root/testdata/sf0.1").select("poly_id", "wkt")
      .write.mode(SaveMode.Overwrite).parquet(s"$work/polygons")
    spark.stop()
  }
}
