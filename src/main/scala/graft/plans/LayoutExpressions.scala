package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Layout expressions — storage-order tools for parquet data skipping.
  *
  * At 100 TB the cheapest scan is the one that never reads the file:
  * parquet keeps min/max statistics per file and row group, and Spark
  * prunes on them — but only if the WRITE ORDER made the statistics
  * selective. A table range-sorted by one key prunes on that key and
  * nothing else; a table range-sorted by the MORTON interleave of two
  * keys tiles the (a, b) plane, so a conjunctive range predicate on
  * BOTH keys intersects only the tiles the query box overlaps — the
  * standard Z-ORDER layout (as in Delta/Iceberg `OPTIMIZE ZORDER BY`),
  * here as a plain expression + writer so vanilla parquet gets it.
  * Measured in ZOrderSpec: on a 64×64 grid written 16 files both ways,
  * a 1/4×1/4 box intersects every linear-sorted file's (a, b) envelope
  * but only a corner of the z-ordered tiling.
  */
object LayoutExpressions {

  /** bit-spread x's low 32 bits to the even bit positions of a long —
    * the standard interleave mask cascade */
  def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    (v | (v << 1)) & 0x5555555555555555L
  }

  /** Morton code of two coordinates: interleaved low-32 bits. */
  def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** Morton (Z-order) interleave of two long coordinates' low 32 bits —
  * `a` on even bits, `b` on odd. Values are masked to 32 bits (z-order
  * keys are layout coordinates — callers bucket/offset real values into
  * an unsigned 32-bit domain first; the masking keeps the expression
  * total). Null in → null out. SQL name: `graft_morton`.
  */
case class MortonCodeExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "graft_morton"
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  protected override def nullSafeEval(a: Any, b: Any): Any =
    LayoutExpressions.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      def spreadJava(v: String): String =
        s"""$v = $v & 0xFFFFFFFFL;
           |$v = ($v | ($v << 16)) & 0x0000FFFF0000FFFFL;
           |$v = ($v | ($v << 8)) & 0x00FF00FF00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0F0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x3333333333333333L;
           |$v = ($v | ($v << 1)) & 0x5555555555555555L;""".stripMargin
      s"""
         |long $sa = $a;
         |long $sb = $b;
         |${spreadJava(sa)}
         |${spreadJava(sb)}
         |${ev.value} = $sa | ($sb << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
