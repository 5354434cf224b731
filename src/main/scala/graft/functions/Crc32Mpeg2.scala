package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** CRC-32/MPEG2: poly 0x04C11DB7, init 0xFFFFFFFF, MSB-first, no final
  * xor — the PSI section checksum (reference: `psi_dec.c:477-481`,
  * `3rdplibs/crc`; public CRC catalogue entry CRC-32/MPEG-2).
  *
  * Table-driven; exposed both as a plain Scala function (used by the
  * codec) and as a codegen'd Catalyst expression so DataFrame pipelines
  * keep whole-stage codegen through the integrity check.
  */
object Crc32Mpeg2 {
  val table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04C11DB7 else c << 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  def compute(data: Array[Byte], from: Int, until: Int): Long = {
    var crc = 0xFFFFFFFF
    var i = from
    while (i < until) {
      crc = (crc << 8) ^ table(((crc >>> 24) ^ (data(i) & 0xFF)) & 0xFF)
      i += 1
    }
    crc.toLong & 0xFFFFFFFFL
  }

  def compute(data: Array[Byte]): Long = compute(data, 0, data.length)

  /** A full section (body + trailing CRC) has residue 0. */
  def check(section: Array[Byte]): Boolean =
    section.length >= 4 && compute(section) == 0L

  def apply(c: Column): Column =
    ColumnBridge.column(Crc32Mpeg2Expr(ColumnBridge.expression(c)))
}

/** Catalyst expression: crc32_mpeg2(binary) → long (unsigned 32-bit). */
case class Crc32Mpeg2Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"crc32_mpeg2 needs BINARY input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Crc32Mpeg2.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      bytes => s"graft.functions.Crc32Mpeg2.compute($bytes)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
