package graft.core

import java.util.zip.Inflater

/** Allocation- and lock-frugal decoders for the two lossless formats the
  * engine produces (javax.imageio writes PNG color-type 2 / bit-depth 8 /
  * non-interlaced, and 24-bpp uncompressed bottom-up BMP).
  *
  * Why not ImageIO: profiling the 32-core pipeline showed executor threads
  * serializing on three GLOBAL locks inside the stock path —
  * sun.java2d.Disposer (stream cache), java.lang.ref.Finalizer.register
  * (ImageInputStreamImpl), and jdk.internal.ref.PhantomCleanable (a new
  * java.util.zip.Inflater per PNGImageReader.read). This decoder reuses one
  * Inflater per thread (reset between images) and touches no shared state.
  *
  * Returns null for anything unsupported (caller falls back to ImageIO —
  * e.g. JPEG, whose reader is reused per-thread and registers nothing per
  * image).
  */
object FastImage {

  final case class Decoded(w: Int, h: Int, pixels: Array[Int])

  private val localInflater = new ThreadLocal[Inflater] {
    override def initialValue(): Inflater = new Inflater()
  }

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  @inline private def i32be(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  @inline private def i32le(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  @inline private def i16le(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  def decode(bytes: Array[Byte]): Decoded = {
    // structurally corrupt payloads (IDAT length past the buffer, IDAT
    // before IHDR, broken deflate stream, ...) must honor the null contract
    // — dirty web-scale input is a data problem, not a task-killing one
    try {
      if (bytes.length > 8 && u8(bytes, 0) == 0x89 && bytes(1) == 'P') decodePng(bytes)
      else if (bytes.length > 54 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
      else null
    } catch { case _: Exception => null }
  }

  /** HEADER-ONLY dimensions — PNG IHDR, BMP info header, or JPEG SOF marker
    * scan; null when the container is unrecognized. Decoding a codec stream
    * starts with exactly these fields, and tile/block geometry needs
    * nothing further: profiling the 6M-image flagship showed the tile stage
    * spending ~45% of its CPU inflating pixel arrays that were immediately
    * discarded (the pixel-level decode invariants live in q38/q43, which DO
    * run the full decoders). */
  def dims(bytes: Array[Byte]): Array[Int] = {
    if (bytes.length > 24 && u8(bytes, 0) == 0x89 && bytes(1) == 'P') {
      // PNG mandates IHDR first; verify the tag so a signature-only corrupt
      // buffer falls back to the validating decoder instead of returning
      // whatever sits at the header offsets
      if (bytes(12) != 'I' || bytes(13) != 'H' || bytes(14) != 'D' || bytes(15) != 'R') return null
      val w = i32be(bytes, 16); val h = i32be(bytes, 20)
      if (w > 0 && h > 0) Array(w, h) else null
    } else if (bytes.length > 54 && bytes(0) == 'B' && bytes(1) == 'M') {
      val w = i32le(bytes, 18); val h = math.abs(i32le(bytes, 22))
      if (w > 0 && h > 0) Array(w, h) else null
    } else dimsJpeg(bytes)
  }

  /** JPEG: walk the marker chain to the first frame header (SOF0/1/2/...,
    * excluding DHT/JPG/DAC), whose payload is [precision, h:16, w:16]. */
  private def dimsJpeg(b: Array[Byte]): Array[Int] = {
    if (b.length < 10 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return null
    var pos = 2
    while (pos + 9 < b.length) {
      if (u8(b, pos) != 0xff) return null
      val marker = u8(b, pos + 1)
      if (marker == 0xff) { pos += 1 } // fill byte
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) { pos += 2 } // standalone
      else {
        val len = (u8(b, pos + 2) << 8) | u8(b, pos + 3)
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          val h = (u8(b, pos + 5) << 8) | u8(b, pos + 6)
          val w = (u8(b, pos + 7) << 8) | u8(b, pos + 8)
          return if (w > 0 && h > 0) Array(w, h) else null
        }
        pos += 2 + len
      }
    }
    null
  }

  /** PNG: color type 2 (truecolor), bit depth 8, no interlace. */
  def decodePng(bytes: Array[Byte]): Decoded = {
    var pos = 8
    var w = 0; var h = 0
    var idat: Array[Byte] = null
    var idatLen = 0
    while (pos + 8 <= bytes.length) {
      val len = i32be(bytes, pos)
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val dataAt = pos + 8
      typ match {
        case "IHDR" =>
          w = i32be(bytes, dataAt); h = i32be(bytes, dataAt + 4)
          val bitDepth = u8(bytes, dataAt + 8)
          val colorType = u8(bytes, dataAt + 9)
          val interlace = u8(bytes, dataAt + 12)
          if (bitDepth != 8 || colorType != 2 || interlace != 0) return null
          idat = new Array[Byte](bytes.length) // upper bound on compressed size
        case "IDAT" =>
          System.arraycopy(bytes, dataAt, idat, idatLen, len)
          idatLen += len
        case "IEND" =>
          return inflateAndUnfilter(idat, idatLen, w, h)
        case _ => // skip ancillary chunks
      }
      pos = dataAt + len + 4 // skip CRC
    }
    null
  }

  private def inflateAndUnfilter(idat: Array[Byte], idatLen: Int, w: Int, h: Int): Decoded = {
    val stride = w * 3
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = localInflater.get()
    inf.reset()
    inf.setInput(idat, 0, idatLen)
    var off = 0
    while (off < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, off, raw.length - off)
      if (n == 0 && inf.needsInput()) return null // truncated
      off += n
    }
    if (off < raw.length) return null

    val px = new Array[Int](w * h)
    val prev = new Array[Byte](stride)
    val cur = new Array[Byte](stride)
    var y = 0
    var rp = 0
    while (y < h) {
      val filter = raw(rp) & 0xff
      rp += 1
      System.arraycopy(raw, rp, cur, 0, stride)
      rp += stride
      filter match {
        case 0 => // None
        case 1 => // Sub
          var i = 3
          while (i < stride) { cur(i) = (cur(i) + cur(i - 3)).toByte; i += 1 }
        case 2 => // Up
          var i = 0
          while (i < stride) { cur(i) = (cur(i) + prev(i)).toByte; i += 1 }
        case 3 => // Average
          var i = 0
          while (i < stride) {
            val a = if (i >= 3) cur(i - 3) & 0xff else 0
            val b = prev(i) & 0xff
            cur(i) = (cur(i) + ((a + b) >> 1)).toByte
            i += 1
          }
        case 4 => // Paeth
          var i = 0
          while (i < stride) {
            val a = if (i >= 3) cur(i - 3) & 0xff else 0
            val b = prev(i) & 0xff
            val c = if (i >= 3) prev(i - 3) & 0xff else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            cur(i) = (cur(i) + pred).toByte
            i += 1
          }
        case _ => return null
      }
      var x = 0
      val rowBase = y * w
      while (x < w) {
        val i = x * 3
        px(rowBase + x) = ((cur(i) & 0xff) << 16) | ((cur(i + 1) & 0xff) << 8) | (cur(i + 2) & 0xff)
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    Decoded(w, h, px)
  }

  /** BMP: 24-bpp uncompressed, BITMAPINFOHEADER, bottom-up rows padded to 4. */
  def decodeBmp(bytes: Array[Byte]): Decoded = {
    val dataOffset = i32le(bytes, 10)
    val headerSize = i32le(bytes, 14)
    if (headerSize < 40) return null
    val w = i32le(bytes, 18)
    val hRaw = i32le(bytes, 22)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    val bpp = i16le(bytes, 28)
    val compression = i32le(bytes, 30)
    if (bpp != 24 || compression != 0 || w <= 0 || h <= 0) return null
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (dataOffset + rowSize * h > bytes.length) return null
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (bottomUp) h - 1 - y else y
      var p = dataOffset + srcRow * rowSize
      val rowBase = y * w
      var x = 0
      while (x < w) {
        px(rowBase + x) = ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 1) & 0xff) << 8) | (bytes(p) & 0xff)
        p += 3
        x += 1
      }
      y += 1
    }
    Decoded(w, h, px)
  }
}
