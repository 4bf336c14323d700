package graft.ext.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Order-preserving IEEE-754 bit image of a double:
  * `graft_dbits(x)` returns a LONG `b` such that `b(x) < b(y)` iff
  * `x < y` (for non-NaN inputs; NaN canonicalizes above every finite).
  * The classic radix-sort key transform: positive doubles already
  * compare like their signed bit patterns; negative ones have the sign
  * bit set and DECREASE as magnitude grows, so flipping their 63
  * magnitude bits (`b ^ Long.MaxValue`) restores total order.
  *
  * Purpose: DATA-INDEPENDENT bucketing for the exact-percentile /
  * weighted-median family — `graft_dbits(v) >> shift` is a monotone
  * bin id with ~2^(52-shift+11) cells per binade, which replaces the
  * min/max `width_bucket` scheme and thereby deletes a whole
  * stats pass (scan + aggregate + broadcast join) from every caller.
  * Bin ids are arbitrary (possibly negative) longs — order-consistent
  * but not dense, which the bucket-prune algorithms never needed.
  *
  * Edge semantics (all bucketing-only, never answer-affecting):
  * `-0.0` maps below `+0.0` (equal doubles, adjacent cells — a tie
  * split across a bucket boundary is as valid as a tie inside one);
  * NaN maps to the top cell via `doubleToLongBits` canonicalization.
  */
case class DoubleOrderBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dbits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a double argument, got ${other.simpleString}")
  }

  override def nullSafeEval(x: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(x.asInstanceOf[Double])
    if (b >= 0L) b else b ^ Long.MaxValue
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val b = ctx.freshName("b")
      s"""
         |long $b = java.lang.Double.doubleToLongBits($x);
         |${ev.value} = ($b >= 0L) ? $b : ($b ^ 0x7fffffffffffffffL);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DoubleOrderBits {
  val name = "graft_dbits"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DoubleOrderBits].getName, null, name,
    "_FUNC_(x) - order-preserving long bit image of a double (codegen'd).", "")

  val builder: Seq[Expression] => Expression = {
    case Seq(x) => DoubleOrderBits(x)
    case other => throw new IllegalArgumentException(
      s"$name expects exactly 1 argument, got ${other.size}")
  }

  /** Idempotently register into a LIVE session (driver owns the
    * SparkSession; see [[ArrayDotProduct.ensureRegistered]]).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }
}
