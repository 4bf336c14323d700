package graft.ext.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite the declarative stopword-count pattern
  *
  *   size(filter(split(text, ' '), w -> w IN ('the','a',...)))
  *
  * into the codegen'd one-pass kernel
  *
  *   cast(graft_word_hits(text, array('the','a',...))[1] as int)
  *
  * Higher-order functions evaluate their lambda INTERPRETED, outside
  * whole-stage codegen — per token, per row; the kernel is one compiled
  * pass with a HashSet probe. Callers keep writing the built-in
  * formulation (and pure-SQL users get the rewrite transparently via
  * `spark.sql.extensions=graft.ext.GraftExtensions`); the optimizer
  * picks the fast path, which is exactly how an engine is supposed to
  * absorb domain kernels — at the PLAN level, not by forcing every call
  * site to know the fast function's name.
  *
  * Semantics-preserving by construction, and only where provable:
  *  - the filtered array must come from split(text, ' ', -1) — the
  *    kernel tokenizes identically (empty tokens match no word set, so
  *    split-edge differences cannot change counts);
  *  - the lambda must be a bare membership test of the lambda variable
  *    against a constant string collection (In or, post-OptimizeIn,
  *    InSet);
  *  - size()'s null semantics are preserved in BOTH modes: non-legacy
  *    (null array -> null) maps to the kernel's null propagation;
  *    legacy/ANSI-off (null array -> -1) wraps the kernel in
  *    `if(isnull(text), -1, ...)` — split() is null exactly when its
  *    input is.
  */
object KernelRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayFilter(split, LambdaFunction(cond, Seq(v: NamedLambdaVariable), _)), legacy)
          if splitText(split).isDefined && constantWords(cond, v).isDefined =>
        val text = splitText(split).get
        val words = constantWords(cond, v).get
        val hits = WordSetHits(Seq(text,
          CreateArray(words.map(w => Literal(UTF8String.fromString(w), StringType)))))
        val counted = Cast(ElementAt(hits, Literal(1)), IntegerType)
        if (legacy) If(IsNull(text), Literal(-1), counted) else counted
    }

  /** `split(text, ' ', -1)` (single-space literal, unlimited) -> text. */
  private def splitText(e: Expression): Option[Expression] = e match {
    case StringSplit(text, Literal(sep: UTF8String, StringType), Literal(-1, _))
        if sep.toString == " " && text.dataType == StringType =>
      Some(text)
    case _ => None
  }

  /** Bare membership test of the lambda variable against constant
    * strings: `v IN (lit...)` / post-OptimizeIn `InSet(v, set)`.
    *
    * Rejects sets containing "" — `size(filter(split(text,' ',-1),...))`
    * counts trailing empty tokens, but the kernel tokenizes with
    * `String.split(' ')` which DROPS trailing empties, so the rewrite
    * would change results on text with trailing spaces. With every
    * constant non-empty, empty tokens provably can't match and the two
    * formulations agree.
    */
  private def constantWords(cond: Expression, v: NamedLambdaVariable): Option[Seq[String]] =
    (cond match {
      case In(value: NamedLambdaVariable, list)
          if value.exprId == v.exprId &&
            list.forall(l => l.isInstanceOf[Literal] && l.dataType == StringType &&
              l.asInstanceOf[Literal].value != null) =>
        Some(list.map(_.asInstanceOf[Literal].value.asInstanceOf[UTF8String].toString))
      case InSet(value: NamedLambdaVariable, hset)
          if value.exprId == v.exprId && value.dataType == StringType &&
            !hset.contains(null) =>
        Some(hset.toSeq.map(_.asInstanceOf[UTF8String].toString))
      case _ => None
    }).filter(_.forall(_.nonEmpty))
}
