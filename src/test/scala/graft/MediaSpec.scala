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
    def le(v: Int) = be(v).reverse
    val gvid = "GVID".getBytes
    val wav = Media.audioBytes("img-bad", 100)
    val stereo = wav.clone(); stereo(22) = 2 // fmt channels = 2
    val mulaw = wav.clone(); mulaw(20) = 7 // fmt audioFormat = 7 (mu-law)
    val rows = Seq(
      gvid ++ be(1) ++ be(-1), // negative frame length
      gvid ++ be(2) ++ be(9999), // truncated frame
      "RIFF".getBytes ++ le(36) ++ "WAVE".getBytes ++
        "data".getBytes ++ le(0x40000000), // data chunk size past the buffer
      wav.take(30), // truncated mid-fmt
      stereo, // real-but-unsupported: not mono
      mulaw // real-but-unsupported: not PCM
    ).map(Tuple1(_)).toDF("b")
    val r = rows.select(video_frame_sample($"b", 2).as("f"), audio_stats($"b").as("s"))
      .collect()
    assert(r(0).isNullAt(0) && r(1).isNullAt(0), "corrupt video -> null")
    (2 to 5).foreach(i => assert(r(i).isNullAt(1), s"corrupt/unsupported audio row $i -> null"))
  }

  test("audio container: canonical RIFF/WAVE header + exact integer sample stats") {
    val wav = Media.audioBytes("img-a1", 1000)
    // spec-true header: RIFF size, WAVE, PCM16 mono fmt chunk, data size
    assert(new String(wav.slice(0, 4)) == "RIFF" && new String(wav.slice(8, 12)) == "WAVE")
    assert(new String(wav.slice(12, 16)) == "fmt " && new String(wav.slice(36, 40)) == "data")
    assert(wav.length == 44 + 2000)
    // an extra LIST chunk before data must be skipped by the chunk walk
    val withList = wav.slice(0, 36) ++ "LIST".getBytes ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes ++ wav.drop(36)
    val df = Seq(("img-a1", 1000)).toDF("id", "n")
    val st = df.select(audio_stats(audio_synth(struct($"id", $"n"))))
      .collect()(0).getStruct(0)
    val st2 = Seq(Tuple1(withList)).toDF("b").select(audio_stats($"b"))
      .collect()(0).getStruct(0)
    assert(st.getInt(0) == 1000 && st2.getInt(0) == 1000)
    assert(st.getInt(1) >= 26000 && st.getInt(1) <= 26214,
      s"peak ${st.getInt(1)} outside the sampled-sine envelope")
    assert(st.getInt(2) >= 19 && st.getInt(2) <= 21,
      s"zero crossings ${st.getInt(2)} != ~2 per period over 10 periods")
    assert(st2.getInt(1) == st.getInt(1) && st2.getInt(2) == st.getInt(2))
  }
}
