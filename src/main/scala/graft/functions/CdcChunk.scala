package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Content-defined chunking (FastCDC-style gear hash, public recipe:
  * Xia et al., USENIX ATC'16; the LBFS/Venti chunk-dedup lineage): split
  * a binary payload at positions where a byte-wise rolling gear hash
  * masks to zero, so chunk boundaries follow CONTENT, not offsets — an
  * insertion near the head shifts every byte after it, yet all chunks
  * past the next boundary re-align and dedup against the store. This is
  * the chunk-level companion of the whole-asset CAS layer (m10/m11):
  * at 100 TB, near-identical media (re-muxed captures, re-encoded
  * variants, appended logs) share most chunks while whole-asset
  * hashing shares none.
  *
  * Parameters are fixed (min 16, mask 6 bits → 64-byte average, max 256)
  * so the split is a pure deterministic function of the bytes. Chunk
  * identity is FNV-1a 64 over the chunk's bytes. Exposed as a codegen'd
  * Catalyst expression returning array<struct<off,len,hash>> — the
  * explode feeding the dedup rollup stays inside whole-stage codegen.
  */
object CdcChunk {
  val MinLen = 16
  val MaxLen = 256
  val Mask = 0x3FL // 6 bits → 1/64 boundary probability

  /** Deterministic 256-entry gear table from an LCG (no RNG at query
    * time; the table is a compile-time constant of the algorithm). */
  val gear: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(256) {
      x = x * 6364136223846793005L + 1442695040888963407L
      x
    }
  }

  def fnv1a64(data: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) {
      h ^= (data(i) & 0xFFL)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  /** Boundary offsets (exclusive chunk ends) for one payload. */
  def cuts(data: Array[Byte]): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var start = 0
    var h = 0L
    var i = 0
    while (i < data.length) {
      h = (h << 1) + gear(data(i) & 0xFF)
      val len = i - start + 1
      if ((len >= MinLen && (h & Mask) == 0L) || len >= MaxLen) {
        out += i + 1
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < data.length) out += data.length
    out.toArray
  }

  /** Catalyst-facing: array<struct<off:int, len:int, hash:long>>. */
  def chunkData(data: Array[Byte]): ArrayData = {
    val ends = cuts(data)
    val rows = new Array[Any](ends.length)
    var start = 0
    var k = 0
    while (k < ends.length) {
      val end = ends(k)
      rows(k) = InternalRow(start, end - start, fnv1a64(data, start, end))
      start = end
      k += 1
    }
    new GenericArrayData(rows)
  }

  def apply(c: Column): Column =
    ColumnBridge.column(CdcChunkExpr(ColumnBridge.expression(c)))
}

/** cdc_chunks(binary) → array<struct<off,len,hash>> (codegen'd). */
case class CdcChunkExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("off", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cdc_chunks needs BINARY input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    CdcChunk.chunkData(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      bytes => s"graft.functions.CdcChunk.chunkData($bytes)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
