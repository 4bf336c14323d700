package graft.ext.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static text kernels shared by the interpreted and generated paths of
  * the expressions below. Token semantics are EXACTLY Spark
  * `split(text, " ", -1)` / Java `String.split(" ", -1)` (every run
  * between spaces counts, trailing empty tokens KEPT) — the same
  * convention as DuckDB `string_split`, so fingerprints are exactly
  * replayable as SQL oracles. The mapPartitions kernels in
  * [[graft.ext.Dedup]] share the contract; ExtSpec consistency tests
  * pin the expression/kernel paths equal. ([[TextKernels.wordSetHits]]
  * is the one deliberate exception: it probes tokens against non-empty
  * constant sets, where an empty token provably can't match, so the
  * split edge semantics are unobservable there.)
  */
object TextKernels {

  /** 64-bit SimHash over whitespace tokens: each token's 64-bit hash —
    * the first 8 md5 digest bytes read big-endian, so Spark and DuckDB
    * compute identical values from `md5(token)` hex — votes +-1 per
    * bit; fingerprint bit = vote sign. Token semantics are Spark's
    * `split(text, " ", -1)` (EVERY run between spaces counts, empties
    * included), which is also DuckDB `string_split`'s convention — the
    * two properties that make [[graft.ext.Dedup.simhash64]] exactly
    * replayable as a SQL oracle. (An engine-local deployment that never
    * cross-checks against another engine could swap in XXH64 here for
    * ~3x cheaper token hashing; the portable md5 form is the default
    * because fingerprint bits are then an engine-independent contract.)
    */
  def simhash64(s: UTF8String): Long = {
    val votes = new Array[Int](64)
    val bytes = s.getBytes
    val md = md5Local.get()
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        md.reset()
        md.update(bytes, start, i - start)
        vote(votes, md5High64(md.digest()))
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (votes(j) >= 0) fp |= 1L << j; j += 1 }
    fp
  }

  /** First 8 md5 digest bytes as a big-endian long — the value DuckDB
    * reconstructs from hex chars 1..16 of `md5(token)`.
    */
  @inline def md5High64(d: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  @inline private def vote(votes: Array[Int], h: Long): Unit = {
    var j = 0
    while (j < 64) { votes(j) += (((h >>> j) & 1L).toInt << 1) - 1; j += 1 }
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Portable 16-bit SimHash ('0'/'1' chars): per token, md5 nibbles
    * 1..16 vote +1/-1 on the corresponding bit; bit = vote sign. Token
    * semantics here are Spark's `split(text, " ", -1)` — EVERY run
    * between spaces counts, including empty ones (md5('') votes), which
    * is also DuckDB string_split's behavior — so the fingerprint is
    * bit-identical to both the previous explode+16-sums formulation and
    * the SQL oracle.
    */
  def simhash16(s: UTF8String): UTF8String = {
    val votes = new Array[Int](16)
    val bytes = s.getBytes
    val md = md5Local.get()
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        var j = 0
        while (j < 8) {
          val b = d(j) & 0xff
          // nibble 2j = high hex char, nibble 2j+1 = low; "high" nibble
          // (8..f) <=> bit 3 set <=> vote +1
          votes(2 * j) += (((b >>> 7) & 1) << 1) - 1
          votes(2 * j + 1) += (((b >>> 3) & 1) << 1) - 1
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Byte](16)
    var j = 0
    while (j < 16) { out(j) = if (votes(j) >= 0) '1'.toByte else '0'.toByte; j += 1 }
    UTF8String.fromBytes(out)
  }

  /** Repetition counts in ONE pass: [n_tokens, n_distinct_tokens,
    * n_distinct_bigrams]. Token semantics are Spark's `split(text, " ")`
    * (limit -1: EVERY run between spaces counts, empties included) —
    * the same convention as DuckDB string_split, so counts equal the
    * built-in `size(array_distinct(...))` formulation exactly (HashSet
    * distinct on full strings: no hash-collision caveat). Bigram
    * identity is the space-joined token pair — unambiguous because
    * tokens cannot contain the separator. Replaces two materialized
    * string arrays + two array_distinct passes per row.
    */
  def repCounts(s: UTF8String): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val tokSet = new java.util.HashSet[String]()
    val bgSet = new java.util.HashSet[String]()
    var prev: String = null
    var i = 0
    while (i < toks.length) {
      val w = toks(i)
      tokSet.add(w)
      if (prev != null) bgSet.add(prev + " " + w)
      prev = w
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      Array(toks.length.toLong, tokSet.size.toLong, bgSet.size.toLong))
  }

  /** [n_tokens, n_distinct_terms, sum c*ln(c)] over whitespace tokens
    * (split(" ", -1), matching SQL string_split) in ONE pass — the
    * per-row state for Shannon token entropy. All three returned as
    * doubles (counts are exact below 2^53); the enclosing projection
    * derives H = (ln n - clc/n)/ln 2. The clc partial sums accumulate
    * in HashMap iteration order — deterministic for given content, and
    * within ~1 ulp of any other order, far under the trunc4 grid the
    * oracle compares on.
    */
  def tokenEntropy(s: UTF8String): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val m = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < toks.length) { m.merge(toks(i), 1, Integer.sum _); i += 1 }
    var clc = 0.0
    val it = m.values().iterator()
    while (it.hasNext) { val c = it.next().toDouble; clc += c * Math.log(c) }
    UnsafeArrayData.fromPrimitiveArray(
      Array(toks.length.toDouble, m.size.toDouble, clc))
  }

  /** Per-set membership counts over whitespace tokens: one pass over the
    * text, one compiled HashSet probe per (token, set). Empty tokens
    * match nothing, so exact split-edge semantics don't matter here.
    */
  def wordSetHits(s: UTF8String, sets: Array[java.util.HashSet[String]]): ArrayData = {
    val counts = new Array[Long](sets.length)
    val toks = s.toString.split(' ')
    var i = 0
    while (i < toks.length) {
      val w = toks(i)
      var j = 0
      while (j < sets.length) { if (sets(j).contains(w)) counts(j) += 1; j += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }
}

/** `graft_simhash64(text)` — codegen'd 64-bit SimHash fingerprint.
  * Replaces the mapPartitions kernel as the default path: same
  * fingerprints (shared static kernel), but the expression keeps the
  * scan columnar and fuses into the enclosing WholeStageCodegen stage
  * instead of forcing a Tungsten->JVM-object deserialization of every
  * row.
  */
case class Simhash64Expr(child: Expression) extends UnaryExpression {
  override def prettyName: String = Simhash64Expr.name
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.expr.TextKernels.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Simhash64Expr =
    copy(child = newChild)
}

object Simhash64Expr {
  val name = "graft_simhash64"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Simhash64Expr].getName, null, name,
    "_FUNC_(text) - 64-bit SimHash of whitespace tokens (md5-high-64 " +
      "token votes, codegen'd; matches the SQL md5 formulation).", "")

  val builder: Seq[Expression] => Expression = {
    case Seq(t) => Simhash64Expr(t)
    case other => throw new IllegalArgumentException(
      s"$name expects exactly 1 argument, got ${other.size}")
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }
}

/** `graft_simhash16(text)` — codegen'd portable 16-bit SimHash (md5
  * token votes). Replaces an explode + groupBy + 16 conditional sums
  * plan — a full shuffle of every token — with a single map-side pass
  * that fuses into the scan: at corpus scale the difference is shuffling
  * the tokenized corpus vs shuffling nothing.
  */
case class Simhash16Expr(child: Expression) extends UnaryExpression {
  override def prettyName: String = Simhash16Expr.name
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash16(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.expr.TextKernels.simhash16($c)")

  override protected def withNewChildInternal(newChild: Expression): Simhash16Expr =
    copy(child = newChild)
}

object Simhash16Expr {
  val name = "graft_simhash16"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Simhash16Expr].getName, null, name,
    "_FUNC_(text) - portable 16-bit SimHash of whitespace tokens (md5 " +
      "nibble votes, codegen'd; matches the SQL md5 formulation).", "")

  val builder: Seq[Expression] => Expression = {
    case Seq(t) => Simhash16Expr(t)
    case other => throw new IllegalArgumentException(
      s"$name expects exactly 1 argument, got ${other.size}")
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }
}

/** `graft_rep_counts(text)` — [n_tokens, n_distinct_tokens,
  * n_distinct_bigrams] in one codegen'd pass; the kernel behind
  * [[graft.ext.Curation.repetitionStats]] (the built-in formulation
  * materializes a token array AND a bigram string array per row, then
  * array_distinct's both — measured ~4x slower at sf0.1).
  */
case class RepCountsExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = RepCountsExpr.name
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.repCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.expr.TextKernels.repCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): RepCountsExpr =
    copy(child = newChild)
}

object RepCountsExpr {
  val name = "graft_rep_counts"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[RepCountsExpr].getName, null, name,
    "_FUNC_(text) - [n_tokens, n_distinct_tokens, n_distinct_bigrams] over " +
      "whitespace tokens in one pass (codegen'd).", "")

  val builder: Seq[Expression] => Expression = {
    case Seq(t) => RepCountsExpr(t)
    case other => throw new IllegalArgumentException(
      s"$name expects exactly 1 argument, got ${other.size}")
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }
}

/** `graft_token_entropy(text)` — [n_tokens, n_distinct_terms,
  * sum c*ln c] in one codegen'd pass; the kernel behind
  * [[graft.ext.Curation.tokenEntropy]]. The built-in formulation
  * explodes the token stream through TWO hash aggregates — at corpus
  * scale that shuffles every token twice, where this expression
  * shuffles nothing (the whole query collapses to a projection).
  */
case class TokenEntropyExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = TokenEntropyExpr.name
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.tokenEntropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.expr.TextKernels.tokenEntropy($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenEntropyExpr =
    copy(child = newChild)
}

object TokenEntropyExpr {
  val name = "graft_token_entropy"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TokenEntropyExpr].getName, null, name,
    "_FUNC_(text) - [n_tokens, n_distinct_terms, sum c*ln c] over " +
      "whitespace tokens in one pass (codegen'd).", "")

  val builder: Seq[Expression] => Expression = {
    case Seq(t) => TokenEntropyExpr(t)
    case other => throw new IllegalArgumentException(
      s"$name expects exactly 1 argument, got ${other.size}")
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }
}

/** `graft_word_hits(text, array('the',...), array('el',...), ...)` —
  * membership-count vector: for each constant word set, how many
  * whitespace tokens of `text` are members. One tokenize pass serves
  * every set (the built-in HOF formulation re-walks the token array per
  * set on the interpreted higher-order-function path), and the word
  * sets are compiled to HashSets once at plan time, referenced from the
  * generated code. Language-ID's stopword voting is `graft_word_hits`
  * + an argmax CASE.
  */
case class WordSetHits(children: Seq[Expression]) extends Expression {
  override def prettyName: String = WordSetHits.name
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = children.head.nullable
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 2)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (text, <string array literal>...), got ${children.size} args")
    if (children.head.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName arg 1 must be STRING, got ${children.head.dataType.simpleString}")
    children.tail.zipWithIndex.collectFirst {
      case (c, i) if !c.foldable || !c.dataType.isInstanceOf[ArrayType] ||
        c.dataType.asInstanceOf[ArrayType].elementType != StringType =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName arg ${i + 2} must be a foldable array<string>, " +
            s"got ${c.dataType.simpleString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  /** Word sets materialized once from the foldable children. */
  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    children.tail.map { c =>
      val hs = new java.util.HashSet[String]()
      val arr = c.eval(InternalRow.empty).asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) hs.add(arr.getUTF8String(i).toString)
        i += 1
      }
      hs
    }.toArray

  override def eval(input: InternalRow): Any = {
    val t = children.head.eval(input)
    if (t == null) null
    else TextKernels.wordSetHits(t.asInstanceOf[UTF8String], sets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("wordSets", sets, "java.util.HashSet[]")
    val t = children.head.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    val call = s"graft.ext.expr.TextKernels.wordSetHits(${t.value}, $setsRef)"
    if (nullable) {
      ev.copy(code = code"""
        ${t.code}
        boolean ${ev.isNull} = ${t.isNull};
        $javaType ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $call;
        }""")
    } else {
      ev.copy(code = code"""
        ${t.code}
        $javaType ${ev.value} = $call;""", isNull = FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): WordSetHits =
    copy(children = newChildren)
}

object WordSetHits {
  val name = "graft_word_hits"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WordSetHits].getName, null, name,
    "_FUNC_(text, words...) - per-set counts of whitespace tokens " +
      "contained in each constant word set (codegen'd).", "")

  val builder: Seq[Expression] => Expression = { exprs =>
    if (exprs.size >= 2) WordSetHits(exprs)
    else throw new IllegalArgumentException(
      s"$name expects (text, <string array literal>...), got ${exprs.size} args")
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }
}
