package graft.ext.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_might_contain(bloom_bytes, key)` — membership probe of a
  * long key against a serialized `org.apache.spark.util.sketch
  * .BloomFilter` (Spark's public sketch, the same structure its runtime
  * bloom-filter join injects). The filter argument must be a FOLDABLE
  * binary (a literal carrying the built filter): it is deserialized
  * once per expression instance — on each executor, at codegen
  * reference-install time — never per row.
  *
  * One-sided error contract: `false` is exact (the key is definitely
  * absent), `true` may be a false positive at the filter's configured
  * fpp — which is why [[graft.ops.Relational.bloomPrunedSemiJoin]]
  * always re-verifies survivors with an exact join.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a binary serialized bloom filter, got ${left.dataType.simpleString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a FOLDABLE bloom-filter argument (a literal)")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a bigint key, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    // a clear error beats the NPE readFrom(null) would throw deep
    // inside codegen reference installation
    require(bytes != null,
      s"$prettyName: the bloom-filter argument evaluated to null " +
        "(pass the serialized filter bytes as a non-null binary literal)")
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(bloomBytes: Any, key: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // install the DESERIALIZED filter once as a codegen reference; the
    // generated per-row code is a single mightContainLong call
    val bloomRef = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, key) => s"${ev.value} = $bloomRef.mightContainLong($key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  val name = "graft_bloom_might_contain"

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    val info = new ExpressionInfo(classOf[BloomMightContain].getName, name)
    val builder = (children: Seq[Expression]) => {
      require(children.length == 2, s"$name takes exactly 2 arguments")
      BloomMightContain(children.head, children(1))
    }
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }
}
