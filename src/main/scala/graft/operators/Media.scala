package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Multimodal payload operators beyond still images: resize, video frame
  * sampling, audio stats. The container formats are deterministic synthetic
  * fakes (this environment ships no media codecs beyond javax.imageio), but
  * the Spark-side plumbing — binary columns, expression signatures, batch
  * shapes, null contracts — is real and oracle-tested (q47–q49):
  *
  *  - resize: nearest-neighbor over the REAL decoded pixels, re-encoded
  *    PNG. NN with `src = (dst * srcDim) / dstDim` is pure integer math, so
  *    the output bytes are bit-deterministic across partitionings.
  *  - video: `GVID | int32 nFrames | (int32 len | png bytes)*` — frames are
  *    REAL encoded images whose content varies per frame index, so sampled
  *    frames decode and fingerprint like genuine keyframes.
  *  - audio: canonical RIFF/WAVE (PCM16 mono, 16 kHz) — a REAL in-the-wild
  *    container assembled from the spec with stdlib only; content is a
  *    seeded sine at amplitude 0.8, so stats (peak / zero crossings) are
  *    exact integers.
  *
  * All narrow per-row expressions: bytes never shuffle, no driver loops —
  * the same 100 TB shape as the image decode stage.
  */
object Media {

  @inline private def i32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def putI32be(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  // ---------- resize ----------

  /** Nearest-neighbor resample: src index = (dst * srcDim) / dstDim (integer
    * floor) — the standard NN mapping, exact integer arithmetic. */
  def resizeNN(px: Array[Int], w: Int, h: Int, tw: Int, th: Int): Array[Int] = {
    val out = new Array[Int](tw * th)
    var y = 0
    while (y < th) {
      val sy = (y * h) / th
      val rowBase = y * tw
      val srcBase = sy * w
      var x = 0
      while (x < tw) {
        out(rowBase + x) = px(srcBase + (x * w) / tw)
        x += 1
      }
      y += 1
    }
    out
  }

  def resizeBytes(bytes: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    // non-positive target dims follow the same null-on-bad-input contract
    // as the sibling media ops (not a task-killing BufferedImage throw)
    if (tw <= 0 || th <= 0) return null
    val d = Images.decodeToPixels(bytes)
    if (d == null) return null
    val px = resizeNN(d.pixels, d.w, d.h, tw, th)
    val img = new java.awt.image.BufferedImage(tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
    System.arraycopy(px, 0,
      img.getRaster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferInt].getData, 0, tw * th)
    Images.encode(img, "png")
  }

  /** image_resize(bytes, tw, th) -> PNG bytes of the NN-resampled pixels. */
  case class ImageResize(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override protected def nullSafeEval(b: Any, tw: Any, th: Any): Any =
      resizeBytes(b.asInstanceOf[Array[Byte]], tw.asInstanceOf[Int], th.asInstanceOf[Int])
    override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): ImageResize =
      copy(first = f, second = s, third = t)
    override def prettyName: String = "image_resize"
  }

  // ---------- video ----------

  def videoBytes(id: String, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('G'); out.write('V'); out.write('I'); out.write('D')
    putI32be(out, nFrames)
    var i = 0
    while (i < nFrames) {
      // per-frame content: the frame index perturbs the pixel phase, so
      // consecutive frames differ like real keyframes
      val frame = Images.synthBytes(s"$id#f$i", w, h, "png")
      putI32be(out, frame.length)
      out.write(frame, 0, frame.length)
      i += 1
    }
    out.toByteArray
  }

  private def isVideo(b: Array[Byte]): Boolean =
    b.length >= 8 && b(0) == 'G' && b(1) == 'V' && b(2) == 'I' && b(3) == 'D'

  /** video_synth(struct(image_id, w, h, n_frames)) -> container bytes. */
  case class VideoSynth(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override protected def nullSafeEval(input: Any): Any = {
      val r = input.asInstanceOf[InternalRow]
      videoBytes(r.getUTF8String(0).toString, r.getInt(1), r.getInt(2), r.getInt(3))
    }
    override protected def withNewChildInternal(c: Expression): VideoSynth = copy(child = c)
    override def prettyName: String = "video_synth"
  }

  /** video_n_frames(bytes) -> frame count from the header (null if not a
    * video container). */
  case class VideoNFrames(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override protected def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[Array[Byte]]
      if (!isVideo(b)) null else i32be(b, 4)
    }
    override protected def withNewChildInternal(c: Expression): VideoNFrames = copy(child = c)
    override def prettyName: String = "video_n_frames"
  }

  /** video_frame_sample(bytes, every) -> array<binary> of the frames at
    * index 0, every, 2*every, ... (temporal downsampling; null for a
    * non-video payload). */
  case class VideoFrameSample(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
    override def nullable: Boolean = true
    override protected def nullSafeEval(b0: Any, e0: Any): Any = {
      val b = b0.asInstanceOf[Array[Byte]]
      val every = math.max(1, e0.asInstanceOf[Int])
      if (!isVideo(b)) return null
      val n = i32be(b, 4)
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var pos = 8
      var i = 0
      while (i < n && pos + 4 <= b.length) {
        val len = i32be(b, pos)
        pos += 4
        // negative or truncated frame length: corrupt container -> null
        if (len < 0 || pos.toLong + len.toLong > b.length.toLong) return null
        if (i % every == 0) out += java.util.Arrays.copyOfRange(b, pos, pos + len)
        pos += len
        i += 1
      }
      // container cut BETWEEN frame headers: same corruption class as a
      // truncated payload — null, never a shorter-but-valid-looking array
      if (i < n) return null
      new GenericArrayData(out.toArray)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VideoFrameSample =
      copy(left = l, right = r)
    override def prettyName: String = "video_frame_sample"
  }

  // ---------- audio ----------

  val AudioAmp: Int = 26214 // 0.8 * 32767, rounded down
  val AudioRate: Int = 16000 // Hz, mono PCM16

  private def putI32le(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }
  private def putI16le(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }
  @inline private def i32le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  @inline private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Canonical RIFF/WAVE container (PCM16 mono, 16 kHz) — a real in-the-wild
    * format assembled from the spec with stdlib only: RIFF header, 16-byte
    * `fmt ` chunk (PCM, 1 channel, 16-bit), `data` chunk of int16-LE
    * samples. Content: a seeded sine at amplitude 0.8 with 100 samples per
    * period, so peak / zero-crossing stats are exact-by-construction (q49). */
  def audioBytes(id: String, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    putI32le(out, 36 + dataLen) // riff payload: 4 (WAVE) + 24 (fmt) + 8 + data
    out.write('W'); out.write('A'); out.write('V'); out.write('E')
    out.write('f'); out.write('m'); out.write('t'); out.write(' ')
    putI32le(out, 16) // PCM fmt chunk body size
    putI16le(out, 1) // audio format: PCM
    putI16le(out, 1) // channels: mono
    putI32le(out, AudioRate)
    putI32le(out, AudioRate * 2) // byte rate = rate * blockAlign
    putI16le(out, 2) // block align = channels * bytesPerSample
    putI16le(out, 16) // bits per sample
    out.write('d'); out.write('a'); out.write('t'); out.write('a')
    putI32le(out, dataLen)
    val phase = (graft.functions.textexprs.mix64(id.hashCode.toLong) & 0xff) / 255.0 * 2.0 * math.Pi
    var i = 0
    while (i < nSamples) {
      // 100 samples per period: every full buffer of k*100 samples sums to
      // ~0, keeping the mean-centered invariant exact enough to pin
      val s = (AudioAmp * math.sin(2.0 * math.Pi * (i % 100) / 100.0 + phase)).toInt
      out.write(s & 0xff); out.write((s >> 8) & 0xff) // int16 LE
      i += 1
    }
    out.toByteArray
  }

  private def isRiffWave(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** audio_synth(struct(image_id, n_samples)) -> RIFF/WAVE PCM16 bytes. */
  case class AudioSynth(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override protected def nullSafeEval(input: Any): Any = {
      val r = input.asInstanceOf[InternalRow]
      audioBytes(r.getUTF8String(0).toString, r.getInt(1))
    }
    override protected def withNewChildInternal(c: Expression): AudioSynth = copy(child = c)
    override def prettyName: String = "audio_synth"
  }

  /** audio_stats(bytes) -> struct(n_samples, peak, zero_cross) — exact
    * integer sample statistics from a RIFF/WAVE PCM16-mono payload. A real
    * chunk WALK (not fixed offsets): `fmt ` is validated (PCM, mono,
    * 16-bit), unknown chunks are skipped with word alignment, and any
    * malformed, truncated, or unsupported-codec container nulls instead of
    * crashing the task — the same contract as the image/video decoders. */
  case class AudioStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("n_samples", IntegerType, nullable = false),
      StructField("peak", IntegerType, nullable = false),
      StructField("zero_cross", IntegerType, nullable = false)))
    override def nullable: Boolean = true
    override protected def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[Array[Byte]]
      if (!isRiffWave(b)) return null
      // chunk walk: find a PCM16-mono `fmt ` and the `data` chunk
      var pos = 12
      var fmtOk = false
      var dataOff = -1
      var dataLen = -1
      while (pos + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
        val size = i32le(b, pos + 4)
        if (size < 0 || pos.toLong + 8L + size.toLong > b.length.toLong) return null
        if (b(pos) == 'f' && b(pos + 1) == 'm' && b(pos + 2) == 't' && b(pos + 3) == ' ') {
          if (size < 16) return null
          fmtOk = u16le(b, pos + 8) == 1 && // PCM
            u16le(b, pos + 10) == 1 && // mono
            u16le(b, pos + 22) == 16 // 16-bit
          if (!fmtOk) return null // a real but unsupported codec: null
        } else if (b(pos) == 'd' && b(pos + 1) == 'a' && b(pos + 2) == 't' && b(pos + 3) == 'a') {
          dataOff = pos + 8
          dataLen = size
        }
        pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
      if (!fmtOk || dataOff < 0) return null
      val n = dataLen / 2
      var peak = 0
      var zc = 0
      var prev = 0
      var i = 0
      while (i < n) {
        val v = ((b(dataOff + i * 2) & 0xff) | (b(dataOff + i * 2 + 1) << 8)).toShort.toInt
        val a = math.abs(v)
        if (a > peak) peak = a
        if (i > 0 && ((prev < 0 && v >= 0) || (prev >= 0 && v < 0))) zc += 1
        prev = v
        i += 1
      }
      InternalRow(n, peak, zc)
    }
    override protected def withNewChildInternal(c: Expression): AudioStats = copy(child = c)
    override def prettyName: String = "audio_stats"
  }
}
