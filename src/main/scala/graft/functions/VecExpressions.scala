package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Dense-vector kernels for the embedding pipeline (ANN / near-dup cosine).
  *
  * These are the per-PAIR hot path of the similarity joins: a blocked
  * self-join over a 10^12-row corpus evaluates the dot product once per
  * candidate pair, so it must run at FMA speed inside whole-stage codegen —
  * not as an interpreted `aggregate(zip_with(...))` higher-order function
  * (which allocates a lambda frame per element and dominated the round-1
  * bench at 76% of total time).
  *
  * Both expressions generate a tight primitive loop over `ArrayData`
  * (UnsafeArrayData-backed after the quantize projection) with zero
  * allocation per call.
  */
object vecexprs {

  /** dot(a, b) over array<double>; length = min(|a|, |b|). */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
      copy(left = l, right = r)
    override def prettyName: String = "vec_dot"
  }

  /** Number of positions where two long arrays agree (minhash signature
    * verify — runs once per candidate pair, so codegen'd like VecDot). */
  case class SigAgree(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = IntegerType
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0
      var i = 0
      while (i < n) { if (x.getLong(i) == y.getLong(i)) s += 1; i += 1 }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |int $s = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.getLong($i) == $b.getLong($i)) $s++;
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SigAgree =
      copy(left = l, right = r)
    override def prettyName: String = "sig_agree"
  }

  /** squared L2 norm: dot(v, v). */
  case class VecNorm2(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val v = ctx.freshName("v")
        s"""
           |final int $n = $a.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  final double $v = $a.getDouble($i);
           |  $s += $v * $v;
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): VecNorm2 = copy(child = c)
    override def prettyName: String = "vec_norm2"
  }
}
