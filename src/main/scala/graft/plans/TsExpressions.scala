package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GetStructField, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** The TS header parse as Catalyst expressions (SURVEY §2.3 P1 +
  * §2.4/§4): `parse_ts(bytes)` yields the 9-field header struct
  * (`ts_dec.c:257-419` layout), and the optimizer rule below rewrites
  * single-field access `parse_ts(b).pid` into `TsPeek(b, "pid")` — the
  * direct byte arithmetic of the reference's `TS_BUF_GET_PID` macro
  * fast path (`ts.h:51-74`): no struct is built, the peek whole-stage
  * codegens to two mask-and-shift ops, and column pruning reaches the
  * scan. This is the hand-written pushdown of `mpeg2_sp.c:1367`
  * obtained as an optimizer rewrite instead.
  */
object ParseTsHeader {
  val fieldNames: IndexedSeq[String] = IndexedSeq(
    "sync_ok", "tei", "pusi", "priority", "pid", "scrambling",
    "has_af", "has_payload", "cc")

  val schema: StructType = StructType(Seq(
    StructField("sync_ok", BooleanType, nullable = false),
    StructField("tei", BooleanType, nullable = false),
    StructField("pusi", BooleanType, nullable = false),
    StructField("priority", BooleanType, nullable = false),
    StructField("pid", IntegerType, nullable = false),
    StructField("scrambling", IntegerType, nullable = false),
    StructField("has_af", BooleanType, nullable = false),
    StructField("has_payload", BooleanType, nullable = false),
    StructField("cc", IntegerType, nullable = false)))

  /** Runtime kernel shared by interpreted eval and codegen. */
  def evalHeader(b: Array[Byte]): InternalRow = {
    if (b.length < 4) return null
    val b1 = b(1) & 0xFF
    val b3 = b(3) & 0xFF
    new GenericInternalRow(Array[Any](
      (b(0) & 0xFF) == 0x47,
      (b1 & 0x80) != 0,
      (b1 & 0x40) != 0,
      (b1 & 0x20) != 0,
      ((b1 & 0x1F) << 8) | (b(2) & 0xFF),
      (b3 >> 6) & 0x3,
      (b3 & 0x20) != 0,
      (b3 & 0x10) != 0,
      b3 & 0x0F))
  }
}

/** parse_ts(binary) → full header struct. */
case class ParseTsHeader(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ParseTsHeader.schema
  override def nullable: Boolean = true
  override protected def nullSafeEval(b: Any): Any =
    ParseTsHeader.evalHeader(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.ParseTsHeader.evalHeader($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** The P3 macro fast path: one header field straight off the bytes.
  * Whole-stage codegens to a couple of mask/shift ops — no struct, no
  * allocation. */
case class TsPeek(child: Expression, field: String)
    extends UnaryExpression {
  require(ParseTsHeader.fieldNames.contains(field), s"bad field $field")

  override def dataType: DataType = field match {
    case "pid" | "scrambling" | "cc" => IntegerType
    case _ => BooleanType
  }
  override def nullable: Boolean = true

  private def op(b: String): String = field match {
    case "sync_ok"     => s"(($b[0] & 0xFF) == 0x47)"
    case "tei"         => s"(($b[1] & 0x80) != 0)"
    case "pusi"        => s"(($b[1] & 0x40) != 0)"
    case "priority"    => s"(($b[1] & 0x20) != 0)"
    case "pid"         => s"(((($b[1] & 0xFF) & 0x1F) << 8) | ($b[2] & 0xFF))"
    case "scrambling"  => s"((($b[3] & 0xFF) >> 6) & 0x3)"
    case "has_af"      => s"(($b[3] & 0x20) != 0)"
    case "has_payload" => s"(($b[3] & 0x10) != 0)"
    case "cc"          => s"($b[3] & 0x0F)"
  }

  override protected def nullSafeEval(bytes: Any): Any = {
    val b = bytes.asInstanceOf[Array[Byte]]
    if (b.length < 4) null
    else {
      val row = ParseTsHeader.evalHeader(b)
      row.get(ParseTsHeader.fieldNames.indexOf(field),
        dataType)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.length < 4) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${op(c)};
      }
    """)
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Column-API entry points for the expression route. */
object TsColumns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def parse_ts(bytes: Column): Column =
    ColumnBridge.column(ParseTsHeader(ColumnBridge.expression(bytes)))

  def ts_peek(bytes: Column, field: String): Column =
    ColumnBridge.column(TsPeek(ColumnBridge.expression(bytes), field))
}

/** Optimizer rule: `parse_ts(b).field` → `TsPeek(b, field)` — struct
  * construction is eliminated wherever only individual fields are
  * consumed (the common demux predicates: pid routing, PUSI sync, CC
  * audit). Registered via `GraftExtensions`. */
object TsHeaderFieldPushdown extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GetStructField(p: ParseTsHeader, ordinal, _) =>
        TsPeek(p.child, ParseTsHeader.fieldNames(ordinal))
    }
}
