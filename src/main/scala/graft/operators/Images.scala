package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import graft.core.TileMath
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Image payload axis (BASELINE.json input_hint: images(image_id, bytes, w,
  * h, fmt, caption, phash)).
  *
  * Pixels are a pure function of (image_id, w, h) so decoded-pixel checks
  * are reproducible without external data; encode/decode run on
  * javax.imageio (PNG/BMP lossless, JPEG lossy with PSNR >= 40 dB at
  * quality 0.95 on this smooth synthetic content).
  *
  * Raster->tile: [[ImageTileBlocks]] maps 8x8 pixel blocks of a row's
  * geographic footprint (bbox) to Web-Mercator Z/X/Y tiles — the explode ->
  * groupBy(z,x,y) aggregation is the "raster-tile assignment" of the
  * north_star.
  */
object Images {

  // ImageIO's default stream cache is DISK-backed: every decode writes a
  // temp file, serializing all executor threads on /tmp I/O (measured: 32
  // cores SLOWER than 8). Memory-cached streams keep decode CPU-bound.
  ImageIO.setUseCache(false)

  /** Deterministic RGB for pixel (x, y) of image `id` — smooth gradients
    * (JPEG-friendly) with id-seeded phase. The sinusoid wavelength is a
    * FIXED 96 px (not normalized to image size): small thumbnails stay as
    * smooth as large frames, keeping the north_star PSNR >= 40 dB invariant
    * true at every size (4:2:0 chroma subsampling of a size-normalized
    * pattern broke it below ~32 px: measured 27-31 dB). */
  @inline def pixel(idHash: Long, x: Int, y: Int, w: Int, h: Int): Int = {
    val fx = x.toDouble / 96.0
    val fy = y.toDouble / 96.0
    val p1 = ((idHash & 0xff) / 255.0) * 6.283
    val p2 = (((idHash >> 8) & 0xff) / 255.0) * 6.283
    val r = (127.5 + 127.0 * math.sin(6.283 * fx + p1)).toInt
    val g = (127.5 + 127.0 * math.cos(6.283 * fy + p2)).toInt
    val b = (127.5 + 127.0 * math.sin(6.283 * (fx + fy) + p1 + p2)).toInt
    (r << 16) | (g << 8) | b
  }

  def idHash(imageId: String): Long = {
    var h = 0xcafef00dL
    imageId.foreach(c => h = graft.functions.textexprs.mix64(h ^ c.toLong))
    h
  }

  def render(imageId: String, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val ih = idHash(imageId)
    // bulk raster fill: per-pixel setRGB pays a ColorModel call per pixel
    val buf = img.getRaster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferInt].getData
    var y = 0
    while (y < h) {
      val base = y * w
      var x = 0
      while (x < w) { buf(base + x) = pixel(ih, x, y, w, h); x += 1 }
      y += 1
    }
    img
  }

  def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    fmt match {
      case "jpg" | "jpeg" =>
        val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
        val params = writer.getDefaultWriteParam
        params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        params.setCompressionQuality(0.95f)
        val ios = ImageIO.createImageOutputStream(out)
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), params)
        writer.dispose(); ios.close()
      case f => ImageIO.write(img, f, out)
    }
    out.toByteArray
  }

  /** Disposer-free ImageInputStream over a byte array. The stock
    * MemoryCacheImageInputStream registers with sun.java2d.Disposer — a
    * GLOBAL synchronized registry — in its constructor, serializing all
    * executor threads (thread dumps showed 30+ workers parked in
    * Disposer.addRecord; 32-core decode ran 2x SLOWER than 8-core). */
  private final class ByteArrayImageInputStream(buf: Array[Byte])
      extends javax.imageio.stream.ImageInputStreamImpl {
    override def read(): Int = {
      bitOffset = 0
      if (streamPos >= buf.length) -1
      else { val v = buf(streamPos.toInt) & 0xff; streamPos += 1; v }
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      bitOffset = 0
      if (streamPos >= buf.length) -1
      else {
        val n = math.min(len, buf.length - streamPos.toInt)
        System.arraycopy(buf, streamPos.toInt, b, off, n)
        streamPos += n
        n
      }
    }
    override def length(): Long = buf.length.toLong
    override def isCached: Boolean = true
    override def isCachedMemory: Boolean = true
    // ImageInputStreamImpl declares a (deprecated) finalize(), which makes
    // every instance finalizable -> java.lang.ref.Finalizer.register, a
    // global lock (thread dumps showed 40+ workers inside it). An empty
    // override in the concrete class makes instances non-finalizable.
    @annotation.nowarn("cat=deprecation")
    override def finalize(): Unit = {}
  }

  /** Bulk packed-RGB pixel extraction. Per-pixel BufferedImage.getRGB goes
    * through ColorModel.getRGB behind a shared lock (contended across
    * executor threads); raw DataBuffer access is lock-free. */
  def pixels(img: BufferedImage): Array[Int] = {
    val w = img.getWidth; val h = img.getHeight
    img.getRaster.getDataBuffer match {
      case b: java.awt.image.DataBufferByte
          if img.getType == BufferedImage.TYPE_3BYTE_BGR =>
        val d = b.getData
        val out = new Array[Int](w * h)
        var i = 0; var p = 0
        while (i < out.length) {
          out(i) = ((d(p + 2) & 0xff) << 16) | ((d(p + 1) & 0xff) << 8) | (d(p) & 0xff)
          p += 3; i += 1
        }
        out
      case b: java.awt.image.DataBufferInt
          if img.getType == BufferedImage.TYPE_INT_RGB =>
        b.getData.map(_ & 0xffffff)
      case _ =>
        img.getRGB(0, 0, w, h, null, 0, w).map(_ & 0xffffff)
    }
  }

  /** Per-thread reader instances: skips the synchronized SPI registry scan
    * and reader construction on every row. */
  private val localReaders =
    new ThreadLocal[Map[String, javax.imageio.ImageReader]] {
      override def initialValue(): Map[String, javax.imageio.ImageReader] = Map(
        "png" -> ImageIO.getImageReadersByFormatName("png").next(),
        "jpeg" -> ImageIO.getImageReadersByFormatName("jpeg").next(),
        "bmp" -> ImageIO.getImageReadersByFormatName("bmp").next())
    }

  private def sniffFormat(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xff) == 0x89 && b(1) == 'P') "png"
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else ""

  /** Returns null for undecodable payloads — including those carrying a
    * VALID format signature followed by garbage (a reader exception on
    * dirty web-scale bytes is a data problem, not a task-killing one). */
  def decode(bytes: Array[Byte]): BufferedImage = {
    try {
      val fmt = sniffFormat(bytes)
      if (fmt.isEmpty) return ImageIO.read(new ByteArrayInputStream(bytes)) // fallback
      val reader = localReaders.get()(fmt)
      val in = new ByteArrayImageInputStream(bytes)
      try {
        reader.setInput(in, true, true)
        reader.read(0)
      } finally {
        reader.setInput(null)
        in.close()
      }
    } catch {
      // NonFatal: a reader exception on dirty bytes is a data problem, but
      // an InterruptedException (task cancellation mid-decode) must
      // propagate, not become a silent null result
      case scala.util.control.NonFatal(_) => null
    }
  }

  def synthBytes(imageId: String, w: Int, h: Int, fmt: String): Array[Byte] =
    encode(render(imageId, w, h), fmt)

  /** Lock-free fast path for the lossless formats (graft.core.FastImage),
    * ImageIO (per-thread reader) for everything else. */
  def decodeToPixels(bytes: Array[Byte]): graft.core.FastImage.Decoded = {
    val fast = graft.core.FastImage.decode(bytes)
    if (fast != null) fast
    else {
      val img = decode(bytes)
      if (img == null) null
      else graft.core.FastImage.Decoded(img.getWidth, img.getHeight, pixels(img))
    }
  }

  /** Peak signal-to-noise ratio between two images (dB; +Inf if identical). */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight)
    val pa = pixels(a); val pb = pixels(b)
    var se = 0.0; var n = 0L
    var i = 0
    while (i < pa.length) {
      var s = 16
      while (s >= 0) {
        val d = ((pa(i) >> s) & 0xff) - ((pb(i) >> s) & 0xff)
        se += d.toDouble * d; n += 1
        s -= 8
      }
      i += 1
    }
    if (se == 0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / (se / n))
  }

  /** 64-bit perceptual hash: 8x8 block-mean luminance vs overall mean. */
  def phash(img: BufferedImage): Long = {
    val px = pixels(img)
    val iw = img.getWidth
    val means = new Array[Double](64)
    val bw = math.max(1, img.getWidth / 8); val bh = math.max(1, img.getHeight / 8)
    var total = 0.0
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        var sum = 0.0; var n = 0
        var y = by * bh
        while (y < math.min((by + 1) * bh, img.getHeight)) {
          var x = bx * bw
          while (x < math.min((bx + 1) * bw, img.getWidth)) {
            val p = px(y * iw + x)
            sum += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
            n += 1; x += 1
          }
          y += 1
        }
        means(by * 8 + bx) = if (n == 0) 0 else sum / n
        total += means(by * 8 + bx)
        bx += 1
      }
      by += 1
    }
    val avg = total / 64
    var bits = 0L
    var i = 0
    while (i < 64) { if (means(i) > avg) bits |= (1L << i); i += 1 }
    bits
  }

  // ---------- Catalyst expressions ----------

  val decodedType: StructType = StructType(Seq(
    StructField("w", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("pixels", ArrayType(IntegerType, containsNull = false), nullable = false)))

  /** Decode an encoded image column to (w, h, packed-RGB pixel array). */
  case class ImageDecode(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = decodedType
    override def nullable: Boolean = true
    override protected def nullSafeEval(input: Any): Any = {
      val d = decodeToPixels(input.asInstanceOf[Array[Byte]])
      if (d == null) return null
      InternalRow(d.w, d.h, UnsafeArrayData.fromPrimitiveArray(d.pixels))
    }
    override protected def withNewChildInternal(c: Expression): ImageDecode = copy(child = c)
    override def prettyName: String = "image_decode"
  }

  /** Synthesize deterministic encoded bytes (test/bench source — the synth
    * generator of SURVEY.md §2.2 "Scans/sources"). args struct:
    * (image_id string, w int, h int, fmt string). */
  case class ImageSynth(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override protected def nullSafeEval(input: Any): Any = {
      val r = input.asInstanceOf[InternalRow]
      synthBytes(r.getUTF8String(0).toString, r.getInt(1), r.getInt(2),
        r.getUTF8String(3).toString)
    }
    override protected def withNewChildInternal(c: Expression): ImageSynth = copy(child = c)
    override def prettyName: String = "image_synth"
  }

  /** PSNR between two encoded images (dB; 999.0 when identical; null when
    * either side is undecodable). */
  case class ImagePsnr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val ia = decode(a.asInstanceOf[Array[Byte]])
      val ib = decode(b.asInstanceOf[Array[Byte]])
      if (ia == null || ib == null) return null
      val p = psnr(ia, ib)
      if (p.isInfinite) 999.0 else p
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): ImagePsnr =
      copy(left = l, right = r)
    override def prettyName: String = "image_psnr"
  }

  /** Decode to dimensions only, from the codec HEADER (PNG IHDR / BMP info
    * header / JPEG SOF — [[graft.core.FastImage.dims]]), with a
    * full-decode fallback for unrecognized containers. The pipeline's
    * tile-assignment stage needs (w, h) and block geometry, not per-pixel
    * values: fully inflating 6M pixel arrays only to discard them was ~45%
    * of the flagship tile stage's CPU and its dominant allocation source
    * (GC). Pixel-LEVEL decode validation is the job of [[ImageDecode]] and
    * the q38/q43 oracle invariants; a payload-corrupt image with an intact
    * header passes here and is caught there. */
  case class ImageDecodeDims(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("w", IntegerType, nullable = false),
      StructField("h", IntegerType, nullable = false)))
    override def nullable: Boolean = true
    override protected def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[Array[Byte]]
      val d = graft.core.FastImage.dims(b)
      if (d != null) return InternalRow(d(0), d(1))
      val full = decodeToPixels(b) // unrecognized container: prove it decodes
      if (full == null) null else InternalRow(full.w, full.h)
    }
    override protected def withNewChildInternal(c: Expression): ImageDecodeDims = copy(child = c)
    override def prettyName: String = "image_decode_dims"
  }

  /** Perceptual hash of an encoded image (null when undecodable). */
  case class ImagePHash(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override protected def nullSafeEval(input: Any): Any = {
      val img = decode(input.asInstanceOf[Array[Byte]])
      if (img == null) null else phash(img)
    }
    override protected def withNewChildInternal(c: Expression): ImagePHash = copy(child = c)
    override def prettyName: String = "image_phash"
  }

  /** Raster->tile assignment: maps each `block`x`block` pixel block of an
    * image spanning bbox (lonMin,latMin,lonMax,latMax) to the Z/X/Y tile
    * containing the block center. args struct:
    * (lon_min, lat_min, lon_max, lat_max double, w int, h int, z int, block int)
    * -> array<struct<tx long, ty long, px_count int>> (aggregated per tile). */
  case class ImageTileBlocks(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("tx", LongType, nullable = false),
      StructField("ty", LongType, nullable = false),
      StructField("px_count", IntegerType, nullable = false))))
    override def nullable: Boolean = true
    override protected def nullSafeEval(input: Any): Any = {
      val r = input.asInstanceOf[InternalRow]
      val lonMin = r.getDouble(0); val latMin = r.getDouble(1)
      val lonMax = r.getDouble(2); val latMax = r.getDouble(3)
      val w = r.getInt(4); val h = r.getInt(5); val z = r.getInt(6)
      // the packed key below gives tx and ty 32 bits each (valid to z = 30,
      // past any real tile scheme); hostile z from table data nulls instead
      // of silently merging distinct tiles
      if (z < 0 || z > 30) return null
      val block = math.max(1, r.getInt(7))
      // flagship hot stage: keys are (tx << 32 | ty) packed longs in a
      // primitive-specialized LongMap (no tuple/Long boxing per block);
      // `order` preserves first-seen order so the emitted ARRAY is
      // byte-identical to the previous LinkedHashMap layout (the q37/q43
      // oracles hash the array order). tx/ty < 2^z <= 2^30, so 32 bits each.
      val counts = new scala.collection.mutable.LongMap[Int]()
      val order = new scala.collection.mutable.ArrayBuffer[Long]()
      var by = 0
      while (by < h) {
        val bh = math.min(block, h - by)
        // latitude decreases with pixel row (image top = north)
        val lat = latMax - (by + bh / 2.0) / h * (latMax - latMin)
        var bx = 0
        while (bx < w) {
          val bw = math.min(block, w - bx)
          val lon = lonMin + (bx + bw / 2.0) / w * (lonMax - lonMin)
          val key = (TileMath.tileX(lon, z) << 32) | TileMath.tileY(lat, z)
          val cur = counts.getOrElse(key, 0) // px counts are >= 1, so 0 = absent
          if (cur == 0) order += key
          counts(key) = cur + bw * bh
          bx += block
        }
        by += block
      }
      val out = new Array[Any](order.length)
      var i = 0
      while (i < order.length) {
        val key = order(i)
        out(i) = InternalRow(key >>> 32, key & 0xffffffffL, counts(key))
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): ImageTileBlocks = copy(child = c)
    override def prettyName: String = "image_tile_blocks"
  }
}
