package graft.ext.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Accumulator for [[VecCovAgg]]: element count, per-dim sums, and the
  * upper-triangle sum of products — everything the covariance matrix
  * needs, in d + d(d+1)/2 doubles. `d = -1` marks "no rows seen yet"
  * (dimension is learned from the first non-null vector).
  */
final class CovBuffer(var d: Int, var n: Long,
    var s: Array[Double], var p: Array[Double]) {
  def init(dim: Int): Unit = {
    d = dim; n = 0L
    s = new Array[Double](dim)
    p = new Array[Double](dim * (dim + 1) / 2)
  }
}

/** One-pass covariance-matrix aggregate: `graft_cov(array<double>)` →
  * `array<struct<i int, j int, n bigint, cov double>>` (upper triangle,
  * j >= i).
  *
  * Why an imperative aggregate: the relational formulation (posexplode
  * both sides, self-join on the row id, partial-first average per (i,j))
  * materializes |rows|·d²/2 join rows before the aggregate can shrink
  * them — at 100 TB that intermediate stream IS the cost (the d² cells
  * are trivial). This operator keeps the whole reduction MAP-SIDE: each
  * partition folds its rows into a d + d(d+1)/2 double buffer, the
  * shuffle carries one buffer per partition, and the merge is a vector
  * add. That is the textbook scalable moment-matrix shape (MLlib's
  * RowMatrix Gramian does the same).
  *
  * Numeric policy: sums are plain doubles in partition order — the
  * cross-engine noise is the usual summation-order ulp, absorbed by the
  * caller's trunc4 exactly as the join formulation's `avg` was.
  * cov(i,j) = E[x_i·x_j] − E[x_i]·E[x_j] (population covariance, the
  * same statistic the previous plan computed). Null vectors are
  * skipped; a dimension mismatch mid-stream throws (corrupt input,
  * never silent). Empty input yields an empty array.
  */
case class VecCovAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "graft_cov"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<double>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("cov", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): CovBuffer =
    new CovBuffer(-1, 0L, null, null)

  override def update(buf: CovBuffer, input: InternalRow): CovBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val d = arr.numElements()
      if (buf.d == -1) buf.init(d)
      else require(buf.d == d,
        s"$prettyName: vector length $d != ${buf.d} seen earlier")
      val x = new Array[Double](d)
      var i = 0
      while (i < d) { x(i) = arr.getDouble(i); i += 1 }
      buf.n += 1
      var t = 0
      i = 0
      while (i < d) {
        buf.s(i) += x(i)
        var j = i
        while (j < d) { buf.p(t) += x(i) * x(j); t += 1; j += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(a: CovBuffer, b: CovBuffer): CovBuffer = {
    if (b.d != -1) {
      if (a.d == -1) a.init(b.d)
      else require(a.d == b.d, s"$prettyName: merge dim ${b.d} != ${a.d}")
      a.n += b.n
      var i = 0
      while (i < a.s.length) { a.s(i) += b.s(i); i += 1 }
      i = 0
      while (i < a.p.length) { a.p(i) += b.p(i); i += 1 }
    }
    a
  }

  override def eval(buf: CovBuffer): Any = {
    if (buf.d == -1 || buf.n == 0L) new GenericArrayData(Array.empty[Any])
    else {
      val d = buf.d; val n = buf.n
      val nd = n.toDouble
      val mu = new Array[Double](d)
      var i = 0
      while (i < d) { mu(i) = buf.s(i) / nd; i += 1 }
      val out = new Array[Any](d * (d + 1) / 2)
      var t = 0
      i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          out(t) = InternalRow(i, j, n, buf.p(t) / nd - mu(i) * mu(j))
          t += 1; j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def serialize(buf: CovBuffer): Array[Byte] = {
    if (buf.d == -1) Array[Byte](0)
    else {
      val bb = ByteBuffer.allocate(1 + 4 + 8 + 8 * (buf.s.length + buf.p.length))
      bb.put(1: Byte).putInt(buf.d).putLong(buf.n)
      buf.s.foreach(bb.putDouble)
      buf.p.foreach(bb.putDouble)
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): CovBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    if (bb.get() == 0) new CovBuffer(-1, 0L, null, null)
    else {
      val d = bb.getInt; val n = bb.getLong
      val s = Array.fill(d)(bb.getDouble)
      val p = Array.fill(d * (d + 1) / 2)(bb.getDouble)
      new CovBuffer(d, n, s, p)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecCovAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecCovAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecCovAgg =
    copy(child = newChild)
}

object VecCovAgg {
  val name = "graft_cov"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[VecCovAgg].getName, null, name,
    "_FUNC_(vec) - one-pass covariance matrix of array<double> rows, " +
      "returned as the upper triangle array<struct<i,j,n,cov>>.", "")

  val builder: Seq[Expression] => Expression = {
    case Seq(x) => VecCovAgg(x)
    case other => throw new IllegalArgumentException(
      s"$name expects 1 arg (array<double> column), got ${other.size}")
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }
}
