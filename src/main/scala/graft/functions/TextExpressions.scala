package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-pipeline expressions for large-scale training-data curation:
  * MinHash signatures (near-dup LSH), SimHash, n-gram shingles, rolling-hash
  * fingerprints, and a character-n-gram language-ID heuristic. All
  * deterministic (seeded mixers, no RNG state). */
object textexprs {

  /** 64-bit mix (splitmix64 finalizer) — deterministic, seedable. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hashString(s: String, seed: Long): Long = {
    var h = seed
    var i = 0
    while (i < s.length) { h = mix64(h ^ s.charAt(i).toLong); i += 1 }
    h
  }

  /** Word w-shingles of a whitespace-tokenized text. */
  def shingles(text: String, w: Int): Array[String] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < w) { if (toks.isEmpty) Array.empty else Array(toks.mkString(" ")) }
    else Array.tabulate(toks.length - w + 1)(i => toks.slice(i, i + w).mkString(" "))
  }

  /** MinHash signature over word shingles: array of n minima of seeded
    * 64-bit hashes (the standard shingle->minhash step of MinHash+LSH
    * dedup). */
  case class MinHash(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(text: Any, nAny: Any, wAny: Any): Any = {
      val sh = shingles(text.asInstanceOf[UTF8String].toString, wAny.asInstanceOf[Int])
      val n = nAny.asInstanceOf[Int]
      val sig = Array.fill(n)(Long.MaxValue)
      var i = 0
      while (i < sh.length) {
        val base = hashString(sh(i), 0x5eedL)
        var j = 0
        while (j < n) {
          val h = mix64(base ^ (j * 0x9e3779b97f4a7c15L))
          if (h < sig(j)) sig(j) = h
          j += 1
        }
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(sig)
    }
    override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): MinHash =
      copy(first = f, second = s, third = t)
    override def prettyName: String = "minhash"
  }

  /** LSH band keys from a MinHash signature: hash each of `bands` rows-sized
    * slices -> array<long> band bucket ids (band index folded in). */
  case class LshBands(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(sigAny: Any, bandsAny: Any): Any = {
      val sig = sigAny.asInstanceOf[ArrayData].toLongArray()
      val bands = bandsAny.asInstanceOf[Int]
      val rows = math.max(1, sig.length / bands)
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var h = 0x1234567L + b
        var i = b * rows
        val end = math.min(sig.length, i + rows)
        while (i < end) { h = mix64(h ^ sig(i)); i += 1 }
        out(b) = h
        b += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): LshBands =
      copy(left = l, right = r)
    override def prettyName: String = "lsh_bands"
  }

  /** 64-bit SimHash over word tokens (sign of per-bit weighted sums). */
  case class SimHash(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(text: Any): Any = {
      val toks = text.asInstanceOf[UTF8String].toString.split("\\s+").filter(_.nonEmpty)
      val acc = new Array[Int](64)
      var i = 0
      while (i < toks.length) {
        val h = hashString(toks(i), 0x51abL)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
      out
    }
    override protected def withNewChildInternal(c: Expression): SimHash = copy(child = c)
    override def prettyName: String = "simhash"
  }

  /** Hamming distance between two 64-bit signatures. */
  case class HammingDist(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])
    override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDist =
      copy(left = l, right = r)
    override def prettyName: String = "hamming_dist"
  }

  /** Karp-Rabin rolling-hash document fingerprint (winnowing-style minimum
    * over character k-gram hashes). */
  case class Fingerprint(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(text: Any, kAny: Any): Any = {
      val s = text.asInstanceOf[UTF8String].toString
      val k = kAny.asInstanceOf[Int]
      if (s.length < k) return hashString(s, 0xf00dL)
      val B = 1000000007L
      var h = 0L
      var pow = 1L
      var i = 0
      while (i < k) { h = h * B + s.charAt(i); if (i < k - 1) pow *= B; i += 1 }
      var minH = mix64(h)
      i = k
      while (i < s.length) {
        h = (h - s.charAt(i - k) * pow) * B + s.charAt(i)
        val m = mix64(h)
        if (m < minH) minH = m
        i += 1
      }
      minH
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Fingerprint =
      copy(left = l, right = r)
    override def prettyName: String = "doc_fingerprint"
  }

  /** Character-trigram language-ID heuristic over a small built-in profile
    * set (en/de/fr/es + unknown). Returns the best-scoring language code. */
  case class LangId(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override protected def nullSafeEval(text: Any): Any = {
      val s = " " + text.asInstanceOf[UTF8String].toString.toLowerCase + " "
      var best = "und"; var bestScore = 0.0
      LangId.profiles.foreach { case (lang, grams) =>
        var score = 0.0
        grams.foreach { g =>
          var idx = s.indexOf(g)
          while (idx >= 0) { score += 1; idx = s.indexOf(g, idx + 1) }
        }
        val norm = score / math.max(1, s.length)
        if (norm > bestScore) { bestScore = norm; best = lang }
      }
      UTF8String.fromString(if (bestScore > 0.002) best else "und")
    }
    override protected def withNewChildInternal(c: Expression): LangId = copy(child = c)
    override def prettyName: String = "lang_id"
  }

  object LangId {
    /** Tiny high-frequency function-word/trigram profiles. */
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq(" the ", " a ", " of ", " and ", " to ", "ing ", " is ", " in "),
      "de" -> Seq(" der ", " die ", " und ", " das ", " ist ", "sch", " ein ", " zu "),
      "fr" -> Seq(" le ", " la ", " les ", " et ", " est ", " une ", " des ", " que "),
      "es" -> Seq(" el ", " la ", " los ", " y ", " es ", " una ", " que ", " de "))
  }
}
