package graft.functions

import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Random-hyperplane LSH signature for float vectors: bit b = sign of
  * v · plane_b, planes drawn deterministically from md5(b|i) parity — no
  * RNG state, identical on every executor and across runs (a requirement
  * for reproducible bucketing at cluster scale). */
object HyperplaneSig {
  private val cache = new ConcurrentHashMap[(Int, Int), Array[Array[Double]]]

  def planes(bits: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((bits, dim), { case (b0, d0) =>
      Array.tabulate(b0, d0) { (b, i) =>
        val h = MessageDigest.getInstance("MD5")
          .digest(s"$b|$i".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1.0 else -1.0
      }
    })

  def evalSig(v: ArrayData, bits: Int): Int = {
    val dim = v.numElements()
    val ps = planes(bits, dim)
    var sig = 0
    var b = 0
    while (b < bits) {
      val p = ps(b)
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += v.getFloat(i).toDouble * p(i); i += 1 }
      if (acc > 0) sig |= (1 << b)
      b += 1
    }
    sig
  }

  def hyperplane_sig(vec: Column, bits: Int): Column =
    ColumnBridge.column(
      HyperplaneSigExpr(ColumnBridge.expression(vec), bits))
}

/** hyperplane_sig(array<float>, bits) → int bucket id. */
case class HyperplaneSigExpr(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 30)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    HyperplaneSig.evalSig(v.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.HyperplaneSig.evalSig($v, $bits)")
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
