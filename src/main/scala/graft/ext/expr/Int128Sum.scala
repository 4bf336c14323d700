package graft.ext.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Exact 128-bit integer SUM aggregate: `graft_sum128(longCol, scale)`.
  *
  * Why: Spark's `sum(decimal)` promotes the buffer past 18 digits, which
  * drops the accumulator out of the compact-long representation onto the
  * JVM BigDecimal path — ~4x slower than a double sum on the same rows
  * (measured: TPC-H-Q1-shaped agg over 600k rows, 1.7s vs 0.4s). DuckDB
  * and Arrow take the same shape fast because they accumulate fixed-point
  * values in an int128. This aggregate is that technique as a Catalyst
  * `DeclarativeAggregate`: the input is a pre-scaled long (value x 10^k
  * from exact fixed-point columns), the buffer is two longs (hi/lo words
  * of a signed 128-bit accumulator), and every update/merge is pure
  * long/bitwise arithmetic — fully inside whole-stage codegen, zero
  * allocation per row.
  *
  * Scale story (the reason a plain `sum(long)` won't do): a long
  * accumulator overflows at ~9.2e18 — for cents x bp products (~1e11 per
  * row) that is only ~1e8 rows, far below 100 TB scale. The 128-bit
  * accumulator overflows at ~1.7e38: ~1e27 such rows. Final conversion
  * to `decimal(38, scale)` happens once per GROUP, not per row.
  *
  * Semantics match SQL SUM: null inputs are skipped; an empty/all-null
  * group yields null. Addition wraps mod 2^128 like any fixed-width
  * accumulator; values beyond decimal(38) surface as null at evaluate
  * (Spark's own decimal sum overflow behavior in legacy mode).
  */
case class Int128Sum(child: Expression, resultScale: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def prettyName: String = "graft_sum128"

  // AbstractDataType/ExpectsInputTypes are private[sql]; check directly.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BIGINT input (pre-scaled fixed-point), " +
        s"got ${child.dataType.simpleString}")
  override def dataType: DataType = DecimalType(38, resultScale)
  override def nullable: Boolean = true

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  /** Carry-out of the unsigned 64-bit add `a + b = s`:
    * MSB of `(a AND b) OR ((a OR b) AND NOT s)` — the classic full-adder
    * carry identity, branch-free.
    */
  private def carryOut(a: Expression, b: Expression, s: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b), BitwiseNot(s))),
      Literal(63))

  // long arithmetic must WRAP (that is the 128-bit carry chain working);
  // EvalMode.LEGACY pins Java semantics even if the session runs ANSI.
  private def add(l: Expression, r: Expression) = Add(l, r, EvalMode.LEGACY)

  override lazy val updateExpressions: Seq[Expression] = {
    val x = child
    val newLo = add(lo, x)
    // sign-extend x to 128 bits: high word = x >> 63 (0 or -1)
    val newHi = add(add(hi, ShiftRight(x, Literal(63))), carryOut(lo, x, newLo))
    Seq(
      If(IsNull(x), hi, newHi),
      If(IsNull(x), lo, newLo),
      Or(seen, IsNotNull(x)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val newLo = add(lo.left, lo.right)
    val newHi = add(add(hi.left, hi.right), carryOut(lo.left, lo.right, newLo))
    Seq(newHi, newLo, Or(seen.left, seen.right))
  }

  /** (hi, lo) -> decimal: hi * 2^64 + unsigned(lo), then shift the
    * decimal point by `resultScale`. Runs once per group.
    */
  override lazy val evaluateExpression: Expression = {
    def dec(p: Int, bd: BigDecimal): Expression =
      Literal.create(Decimal(bd, p, 0), DecimalType(p, 0))
    val loUnsigned = add(
      Cast(BitwiseAnd(lo, Literal(Long.MaxValue)), DecimalType(20, 0)),
      Multiply(
        Cast(ShiftRightUnsigned(lo, Literal(63)), DecimalType(20, 0)),
        dec(19, BigDecimal(2).pow(63)), EvalMode.LEGACY))
    val total = add(
      Multiply(Cast(hi, DecimalType(38, 0)), dec(20, BigDecimal(2).pow(64)), EvalMode.LEGACY),
      loUnsigned)
    val scaled = Divide(total, dec(resultScale + 1, BigDecimal(10).pow(resultScale)),
      EvalMode.LEGACY)
    If(Not(seen), Literal(null, dataType), Cast(scaled, dataType))
  }

  override protected def withNewChildInternal(newChild: Expression): Int128Sum =
    copy(child = newChild)
}

object Int128Sum {
  val name = "graft_sum128"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Int128Sum].getName, null, name,
    "_FUNC_(x, scale) - exact sum of pre-scaled longs in a codegen'd " +
      "128-bit accumulator, returned as decimal(38, scale).", "")

  val builder: Seq[Expression] => Expression = {
    // scale: any integral literal (2, 2L, cast-folded byte/short)
    case Seq(x, Literal(s: Byte, ByteType))    => Int128Sum(x, s.toInt)
    case Seq(x, Literal(s: Short, ShortType))  => Int128Sum(x, s.toInt)
    case Seq(x, Literal(s: Int, IntegerType))  => Int128Sum(x, s)
    case Seq(x, Literal(s: Long, LongType)) if s.isValidInt => Int128Sum(x, s.toInt)
    case Seq(_, badScale) => throw new IllegalArgumentException(
      s"$name scale must be an integer literal, got ${badScale.sql}")
    case other => throw new IllegalArgumentException(
      s"$name expects 2 args (longCol, <integer literal scale>), got ${other.size}")
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }

  /** Column-level entry: exact sum of `c * 10^scale` rounded to long.
    * `c` must hold values exact at `scale` decimal places (fixture money
    * columns are exact 2-dec); the round() only undoes binary-double
    * representation error, never a real fractional digit.
    */
  def sumFixed(c: Column, scale: Int): Column = {
    import org.apache.spark.sql.functions.{lit, round}
    call_function(name, round(c * math.pow(10, scale)).cast("long"), lit(scale))
  }

  /** Column-level entry for an already-scaled long expression (e.g. a
    * product of two fixed-point longs whose scales add up to `scale`).
    */
  def sumLong(c: Column, scale: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(name, c, lit(scale))
  }
}
