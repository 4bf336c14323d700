package graft.ext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import graft.ext.expr.{ArrayDotProduct, CompactResultSortRule, Int128Sum, KernelRewriteRule, RepCountsExpr, Simhash16Expr, Simhash64Expr, TokenEntropyExpr, WordSetHits}

/** SparkSessionExtensions entry point: wire graft's native functions
  * into any session via
  * `spark.sql.extensions=graft.ext.GraftExtensions` (spark-submit /
  * cluster config), making them available to pure-SQL users:
  * `SELECT graft_dot(embedding, query) FROM embeddings`.
  *
  * Sessions we don't configure (e.g. the round driver's) get the same
  * functions lazily via [[ArrayDotProduct.ensureRegistered]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier(ArrayDotProduct.name), ArrayDotProduct.info, ArrayDotProduct.builder))
    ext.injectFunction(
      (FunctionIdentifier(ArrayDotProduct.cosineName), ArrayDotProduct.cosineInfo,
        ArrayDotProduct.cosineBuilder))
    ext.injectFunction(
      (FunctionIdentifier(Int128Sum.name), Int128Sum.info, Int128Sum.builder))
    ext.injectFunction(
      (FunctionIdentifier(Simhash64Expr.name), Simhash64Expr.info, Simhash64Expr.builder))
    ext.injectFunction(
      (FunctionIdentifier(Simhash16Expr.name), Simhash16Expr.info, Simhash16Expr.builder))
    ext.injectFunction(
      (FunctionIdentifier(WordSetHits.name), WordSetHits.info, WordSetHits.builder))
    ext.injectFunction(
      (FunctionIdentifier(RepCountsExpr.name), RepCountsExpr.info, RepCountsExpr.builder))
    ext.injectFunction(
      (FunctionIdentifier(TokenEntropyExpr.name), TokenEntropyExpr.info, TokenEntropyExpr.builder))
    // plan-level rewrite: declarative size(filter(split, IN-set)) ->
    // the codegen'd graft_word_hits kernel (see KernelRewriteRule)
    ext.injectOptimizerRule(_ => KernelRewriteRule)
    // plan-level rewrite: result-delivery global sort -> one-partition
    // local sort when shuffle partitions are volume-sized small
    // (see CompactResultSortRule — never fires at cluster scale)
    ext.injectOptimizerRule(_ => CompactResultSortRule)
  }
}
