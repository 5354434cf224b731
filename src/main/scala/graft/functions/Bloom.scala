package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge

/** Column API over Spark's own bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the kernels
  * behind Catalyst's InjectRuntimeFilter). Spark ships them
  * internal-only; re-exposing them beats reimplementing the sketch:
  * the aggregate is a TypedImperativeAggregate with map-side merge, and
  * the membership probe is codegen-compatible, so both sit inside the
  * existing exchange/codegen machinery. Input hashes are 64-bit
  * (`xxhash64`), matching the runtime-filter convention. */
object Bloom {

  /** One-pass bloom build over a LongType hash column; the aggregate
    * value is the filter's byte image — O(numBits), never O(rows). */
  def bloom_agg(h: Column, estimatedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(h),
      Literal(estimatedItems), Literal(numBits))
      .toAggregateExpression())

  /** Membership probe against a driver-held filter image: the bytes
    * ride into every task as a foldable literal (broadcast-by-plan),
    * exactly how InjectRuntimeFilter ships its subquery result. */
  def bloom_might_contain(bloom: Array[Byte], h: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom), ColumnBridge.expression(h)))
}
