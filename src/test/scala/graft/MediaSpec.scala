package graft

import graft.functions.GraftFunctions._
import graft.operators.{Images, Media}
import org.apache.spark.sql.functions._

/** Multimodal operators beyond still images: NN resize over real decoded
  * pixels, the deterministic video container + frame sampling, PCM audio
  * stats (q47-q49 invariants at unit scale). */
class MediaSpec extends SparkTestBase {
  import spark.implicits._

  test("NN resize: exact dims, deterministic bytes, phash stability") {
    val bytes = Images.synthBytes("img-r1", 48, 32, "png")
    val small = Media.resizeBytes(bytes, 24, 16)
    val d = Images.decodeToPixels(small)
    assert(d.w == 24 && d.h == 16)
    assert(java.util.Arrays.equals(small, Media.resizeBytes(bytes, 24, 16)),
      "resize must be bit-deterministic")
    // NN mapping src = (dst*srcDim)/dstDim: out(0,0) = in(0,0)
    val orig = Images.decodeToPixels(bytes)
    assert(d.pixels(0) == orig.pixels(0))
    val hd = java.lang.Long.bitCount(
      Images.phash(Images.decode(bytes)) ^ Images.phash(Images.decode(small)))
    assert(hd <= 12, s"half-size resample moved phash by $hd bits")
  }

  test("video container: header count, frame sampling, per-frame decode") {
    val vid = Media.videoBytes("img-v1", 32, 16, 6)
    val df = Seq(Tuple1(vid)).toDF("vid")
    val r = df.select(video_n_frames($"vid").as("n"),
      video_frame_sample($"vid", 2).as("fr")).collect()(0)
    assert(r.getInt(0) == 6)
    val frames = r.getSeq[Array[Byte]](1)
    assert(frames.length == 3, "every-2nd sampling of 6 frames keeps 0,2,4")
    frames.foreach { f =>
      val d = Images.decodeToPixels(f)
      assert(d.w == 32 && d.h == 16)
    }
    // exact extraction: sampled frames ARE frames 0/2/4, bit for bit
    frames.zipWithIndex.foreach { case (f, k) =>
      assert(java.util.Arrays.equals(f, Images.synthBytes(s"img-v1#f${2 * k}", 32, 16, "png")),
        s"sampled frame $k must byte-equal container frame ${2 * k}")
    }
    assert(df.select(video_n_frames(lit(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))))
      .collect()(0).isNullAt(0), "non-video payload -> null")
  }

  test("malformed containers null out instead of crashing the task") {
    def be(v: Int) = Array[Byte](((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    val gvid = "GVID".getBytes
    val gaud = "GAUD".getBytes
    val rows = Seq(
      gvid ++ be(1) ++ be(-1),          // negative frame length
      gvid ++ be(2) ++ be(9999),        // truncated frame
      gaud ++ be(0x40000000),           // n*2 overflows int bounds check
      gaud ++ be(-5)                    // negative sample count
    ).map(Tuple1(_)).toDF("b")
    val r = rows.select(video_frame_sample($"b", 2).as("f"), audio_stats($"b").as("s"))
      .collect()
    assert(r(0).isNullAt(0) && r(1).isNullAt(0), "corrupt video -> null")
    assert(r(2).isNullAt(1) && r(3).isNullAt(1), "corrupt audio -> null")
  }

  test("audio container: exact integer sample stats") {
    val df = Seq(("img-a1", 1000)).toDF("id", "n")
    val st = df.select(audio_stats(audio_synth(struct($"id", $"n"))))
      .collect()(0).getStruct(0)
    assert(st.getInt(0) == 1000)
    assert(st.getInt(1) >= 26000 && st.getInt(1) <= 26214,
      s"peak ${st.getInt(1)} outside the sampled-sine envelope")
    assert(st.getInt(2) >= 19 && st.getInt(2) <= 21,
      s"zero crossings ${st.getInt(2)} != ~2 per period over 10 periods")
  }
}
