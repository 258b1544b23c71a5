package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) interleave of two dimension keys — the multi-column
  * clustering key behind Iceberg/Delta `OPTIMIZE ZORDER BY`.
  *
  * A table laid out by ONE sort column gets tight per-file min/max stats on
  * that column only; a range filter on any other column prunes nothing.
  * Interleaving the bits of two columns places rows close in EITHER
  * dimension into the same files, so the `.stats` sidecar bounds stay tight
  * on BOTH — `SnapshotTable.planFiles` then skips files for x-filters AND
  * y-filters of the same layout (WarehouseSpec proves ~4/16 files kept per
  * axis vs 16/16 for the linear layout's second column). At 100 TB this is
  * the difference between one clustering serving one query family and one
  * clustering serving every dimension it encodes.
  *
  * Semantics: both inputs are taken modulo 2^32 (`v & 0xFFFFFFFF`) and
  * bit-interleaved x-low-first into one 64-bit key. Callers normalize
  * dimensions to non-negative ints < 2^31 (ranks, ids, epoch days, bucket
  * numbers) so the signed ordering of the result is the unsigned Z curve.
  * NULL in either input yields NULL. Codegen emits the 12-shift magic-mask
  * sequence inline — no boxing, stays inside whole-stage codegen.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case LongType | IntegerType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 expects two int/long dimension keys, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  private def asLong(v: Any): Long = v match {
    case i: java.lang.Integer => i.toLong
    case l: java.lang.Long => l
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.interleave(asLong(a), asLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (x, y) = (ctx.freshName("zx"), ctx.freshName("zy"))
      def spread(v: String): String =
        s"""$v = $v & 0xFFFFFFFFL;
           |$v = ($v | ($v << 16)) & 0x0000FFFF0000FFFFL;
           |$v = ($v | ($v << 8))  & 0x00FF00FF00FF00FFL;
           |$v = ($v | ($v << 4))  & 0x0F0F0F0F0F0F0F0FL;
           |$v = ($v | ($v << 2))  & 0x3333333333333333L;
           |$v = ($v | ($v << 1))  & 0x5555555555555555L;""".stripMargin
      s"""long $x = (long) $a;
         |long $y = (long) $b;
         |${spread(x)}
         |${spread(y)}
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  private def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}
