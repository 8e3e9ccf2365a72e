package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
import org.apache.spark.sql.SparkSession

/** 64-bit Z-order (Morton) interleave of two integral columns — the
  * multi-dimensional clustering key for storage layout: writing files
  * sorted by `zorder64(x, y)` keeps BOTH x and y ranges tight within
  * every file/row-group, so parquet min/max stats prune scans filtered
  * on either dimension (the Delta/Iceberg Z-ORDER idea, here as a plain
  * sort key usable with `sortWithinPartitions`/`sortBy`).
  *
  * Bit layout: the low 32 bits of each input, interleaved x at even and
  * y at odd positions, via the standard mask-shift spread (no loops —
  * 5 shift/mask steps per side, branch-free in codegen). Inputs are
  * treated as unsigned 32-bit: callers with signed/larger domains
  * should normalize first (e.g. subtract the min). Curve locality:
  * equal high-order z-bits ⇒ same power-of-two quadrant of (x, y).
  */
case class ZOrder64(left: Expression, right: Expression)
    extends BinaryExpression {

  private def integral(t: DataType) = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (integral(left.dataType) && integral(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder64 requires integral inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder64"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val x = ZOrder64.spread(ZOrder64.low32(l))
    val y = ZOrder64.spread(ZOrder64.low32(r))
    x | (y << 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => {
      // call the companion's spread via the module instance (static
      // forwarder presence isn't guaranteed alongside a case class)
      val z = "graft.plans.ZOrder64$.MODULE$"
      s"($z.spread((long)$l & 0xffffffffL) | ($z.spread((long)$r & 0xffffffffL) << 1))"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
}

object ZOrder64 {
  private[plans] def low32(v: Any): Long = (v match {
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
  }) & 0xffffffffL

  /** Spread the low 32 bits of v to the even bit positions of a long
    * (classic Morton mask-shift cascade). Public + JVM-static-reachable
    * so generated code can call it. */
  def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8))  & 0x00ff00ff00ff00ffL
    x = (x | (x << 4))  & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  private[plans] val info =
    new ExpressionInfo(classOf[ZOrder64].getName, "zorder64")

  private[plans] val builder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, "zorder64(x, y)")
    ZOrder64(exprs.head, exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("zorder64"), info, builder)
}
