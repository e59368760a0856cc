package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Driver-built Bloom-filter membership probe, used to push a semi-join
  * BELOW an expensive narrow stage (e.g. image decode) without shuffling
  * the probe side: the build side is reduced to a fixed-size bitset that
  * ships inside the serialized expression, so it broadcasts no matter how
  * large the build-side ROW COUNT is. False positives only cost wasted
  * downstream work — an exact join later removes them.
  */
object sketchexprs {

  /** Value wrapper giving a byte array CONTENT equality with a cached hash:
    * structurally-equal plans compare equal (fixing canonicalization, which
    * raw Array reference-equality defeats) without the O(filter size)
    * element-wise hashCode a Seq[Byte] would recompute on every Catalyst
    * semanticHash/compare — filters run to ~64 MB (Pipeline bloomCap). */
  final class BloomBytes(val bytes: Array[Byte]) extends Serializable {
    override lazy val hashCode: Int = java.util.Arrays.hashCode(bytes)
    override def equals(o: Any): Boolean = o match {
      case b: BloomBytes => (b eq this) ||
        (hashCode == b.hashCode && java.util.Arrays.equals(bytes, b.bytes))
      case _ => false
    }
  }

  /** bloom_contains(<binary literal filter>, <long key>) -> boolean.
    * The filter bytes are fixed at plan time (first arg must be foldable). */
  case class BloomContains(filter: BloomBytes, child: Expression)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
    override def inputTypes = Seq(LongType)
    override def dataType: DataType = BooleanType
    @transient private lazy val bf: BloomFilter =
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(filter.bytes))
    override protected def nullSafeEval(key: Any): Any =
      bf.mightContainLong(key.asInstanceOf[Long])
    override protected def withNewChildInternal(c: Expression): BloomContains =
      copy(child = c)
    override def prettyName: String = "bloom_contains"
  }

  /** Serialize a sketch BloomFilter to bytes (for lit() embedding). */
  def toBytes(bf: BloomFilter): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    bf.writeTo(baos)
    baos.toByteArray
  }
}
