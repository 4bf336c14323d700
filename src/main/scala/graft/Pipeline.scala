package graft

import org.apache.spark.sql.DataFrame

/** Composable pipeline — the code equivalent of the reference's
  * Extract -> Transform -> Load state machine (simple_etl.py:49: sidebar
  * radio driving one operator at a time, materializing after each).
  *
  * Here a pipeline is a pure composition of `DataFrame => DataFrame`
  * stages: nothing runs until a sink/action, so Catalyst optimizes the
  * WHOLE chain as one plan (one scan, fused filters/projections, one
  * shuffle set) — the single biggest structural win over the
  * reference's per-operator pandas round-trips (SURVEY.md §3.1/§4).
  *
  * {{{
  * val cleaned = Pipeline("clean_sales")
  *   .stage("fill", Cleaning.fillNulls(_, "UNKNOWN", 0))
  *   .stage("dedup", Cleaning.dedup)
  *   .stage("fix_region", Mutation.replaceValue(_, "Region", "Jkt", "Jakarta"))
  *   .stage("paid_only", Mutation.filterContains(_, "Status", "Paid"))
  * cleaned(catalog("sales"))                  // lazy DataFrame
  * cleaned.runOn(catalog, "sales", "sales_clean") // bind result name
  * }}}
  */
final case class Pipeline(name: String, stages: Vector[(String, DataFrame => DataFrame)] = Vector.empty)
    extends (DataFrame => DataFrame) {

  def stage(stageName: String, op: DataFrame => DataFrame): Pipeline =
    copy(stages = stages :+ (stageName, op))

  /** Append another pipeline's stages (namespaced). */
  def andThen(next: Pipeline): Pipeline =
    copy(stages = stages ++ next.stages.map { case (n, op) => (s"${next.name}.$n", op) })

  override def apply(in: DataFrame): DataFrame =
    stages.foldLeft(in) { case (df, (_, op)) => op(df) }

  /** Apply to a catalog table and register the (still lazy) result under
    * `outName` — the analogue of the reference writing each result back
    * into its session-state table store (simple_etl.py:344-348), minus
    * the materialization.
    */
  def runOn(catalog: Catalog, inName: String, outName: String): DataFrame =
    catalog.register(outName, apply(catalog(inName)))

  def stageNames: Seq[String] = stages.map(_._1)
}
