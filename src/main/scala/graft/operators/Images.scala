package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import graft.core.TileMath
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

  /** Deterministic RGB for pixel (x, y) of image `id` — smooth gradients
    * (JPEG-friendly) with id-seeded phase. */
  @inline def pixel(idHash: Long, x: Int, y: Int, w: Int, h: Int): Int = {
    val fx = x.toDouble / w
    val fy = y.toDouble / h
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
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixel(ih, x, y, w, h)); x += 1 }
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

  def decode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(bytes))

  def synthBytes(imageId: String, w: Int, h: Int, fmt: String): Array[Byte] =
    encode(render(imageId, w, h), fmt)

  /** Peak signal-to-noise ratio between two images (dB; +Inf if identical). */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight)
    var se = 0.0; var n = 0L
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val pa = a.getRGB(x, y); val pb = b.getRGB(x, y)
        var s = 16
        while (s >= 0) {
          val d = ((pa >> s) & 0xff) - ((pb >> s) & 0xff)
          se += d.toDouble * d; n += 1
          s -= 8
        }
        x += 1
      }
      y += 1
    }
    if (se == 0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / (se / n))
  }

  /** 64-bit perceptual hash: 8x8 block-mean luminance vs overall mean. */
  def phash(img: BufferedImage): Long = {
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
            val p = img.getRGB(x, y)
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
      val img = decode(input.asInstanceOf[Array[Byte]])
      if (img == null) return null
      val w = img.getWidth; val h = img.getHeight
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { px(y * w + x) = img.getRGB(x, y) & 0xffffff; x += 1 }
        y += 1
      }
      InternalRow(w, h, new GenericArrayData(px))
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

  /** PSNR between two encoded images (dB; 999.0 when identical). */
  case class ImagePsnr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val p = psnr(decode(a.asInstanceOf[Array[Byte]]), decode(b.asInstanceOf[Array[Byte]]))
      if (p.isInfinite) 999.0 else p
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): ImagePsnr =
      copy(left = l, right = r)
    override def prettyName: String = "image_psnr"
  }

  /** Perceptual hash of an encoded image. */
  case class ImagePHash(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any =
      phash(decode(input.asInstanceOf[Array[Byte]]))
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
    override protected def nullSafeEval(input: Any): Any = {
      val r = input.asInstanceOf[InternalRow]
      val lonMin = r.getDouble(0); val latMin = r.getDouble(1)
      val lonMax = r.getDouble(2); val latMax = r.getDouble(3)
      val w = r.getInt(4); val h = r.getInt(5); val z = r.getInt(6)
      val block = math.max(1, r.getInt(7))
      val counts = scala.collection.mutable.LinkedHashMap[(Long, Long), Int]()
      var by = 0
      while (by < h) {
        val bh = math.min(block, h - by)
        // latitude decreases with pixel row (image top = north)
        val lat = latMax - (by + bh / 2.0) / h * (latMax - latMin)
        var bx = 0
        while (bx < w) {
          val bw = math.min(block, w - bx)
          val lon = lonMin + (bx + bw / 2.0) / w * (lonMax - lonMin)
          val key = (TileMath.tileX(lon, z), TileMath.tileY(lat, z))
          counts(key) = counts.getOrElse(key, 0) + bw * bh
          bx += block
        }
        by += block
      }
      new GenericArrayData(counts.iterator.map { case ((tx, ty), n) =>
        InternalRow(tx, ty, n)
      }.toArray[Any])
    }
    override protected def withNewChildInternal(c: Expression): ImageTileBlocks = copy(child = c)
    override def prettyName: String = "image_tile_blocks"
  }
}
