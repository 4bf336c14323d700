package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reshape ops (reference: simple_etl.py:244-251 transpose;
  * preview at :173,:365 — SURVEY.md §2.2 T5, §2.4 limits).
  */
object Reshape {

  /** T5 — full-table transpose (rows <-> columns).
    *
    * The reference falls back to pandas `df.T` and itself warns Spark
    * has no native transpose (simple_etl.py:244-251). A transpose of an
    * arbitrary table is inherently bounded: the OUTPUT column count
    * equals the input ROW count, and Spark (like any engine) caps
    * practical column counts at a few thousand — so this is a
    * small-table op by construction, guarded by `maxRows`.
    *
    * Implementation is still distributed until the final pivot:
    * cast-to-string -> unpivot (Spark 4 `melt`) -> `groupBy(col).pivot(row)`.
    */
  def transpose(df: DataFrame, idColumn: String, maxRows: Int = 1000): DataFrame = {
    // ONE eager action serves three needs (an un-valued pivot() would
    // itself run a hidden distinct-collect job before planning, so this
    // single pass is the MINIMUM for the op, not an extra): the row-cap
    // guard, duplicate-id detection — duplicate ids would silently
    // collapse into one pivoted column (pivot + first keeps an
    // arbitrary row), so refuse instead — and the pivot value list,
    // passed explicitly so the returned plan is fully lazy from here on
    // (composing callers pay no further hidden scan).
    val g = df.limit(maxRows + 1)
      .agg(count(lit(1)).as("n"),
        collect_list(col(idColumn).cast("string")).as("ids"),
        max(col(idColumn).isNull).as("has_null"))
      .head()
    val n = g.getLong(0)
    val ids = g.getSeq[String](1) // collect_list drops nulls
    val hasNull = !g.isNullAt(2) && g.getBoolean(2)
    val distinctIds = ids.distinct
    require(n <= maxRows, s"transpose guard: > $maxRows rows (reference was pandas-only too)")
    require(distinctIds.size + (if (hasNull) 1 else 0) == n,
      s"transpose: idColumn '$idColumn' has duplicate values; rows would be lost")
    val valueCols = df.columns.filter(_ != idColumn)
    // everything stringifies: output column names are strings anyway, and
    // pivoting on the string form keeps column order deterministic
    // (lexicographic) regardless of the id column's original type
    val strDf = df.columns.foldLeft(df)((acc, c) => acc.withColumn(c, col(c).cast("string")))
    val melted = strDf.melt(
      ids = Array(col(idColumn)),
      values = valueCols.map(col),
      variableColumnName = "column_name",
      valueColumnName = "value")
    // a null id keeps its pivoted "null" column (un-valued pivot's
    // behavior) instead of silently dropping the row
    val pivotVals: Seq[Any] = distinctIds.sorted ++ (if (hasNull) Seq(null) else Nil)
    melted.groupBy("column_name").pivot(idColumn, pivotVals).agg(first("value"))
  }

  /** Distributed pivot aggregate — groupBy().pivot(): the scale-safe
    * reshape ([[transpose]] is its driver-bound full-table special
    * case). EXPLICIT `pivotValues` matter at 100 TB: without them Spark
    * runs a distinct-collect job over the pivot column before it can
    * even plan; with them the whole pivot is one partial-first hash
    * aggregate pass. Missing (group, value) combinations surface as 0
    * for count-like aggregates (coalesced), matching SQL conditional
    * aggregation.
    */
  def pivotCount(
      df: DataFrame,
      groupExpr: org.apache.spark.sql.Column,
      groupName: String,
      pivotCol: String,
      pivotValues: Seq[String]): DataFrame = {
    val p = df.groupBy(groupExpr.as(groupName)).pivot(pivotCol, pivotValues).count()
    p.select(col(groupName) +: pivotValues.map(v => coalesce(col(v), lit(0L)).as(v)): _*)
  }

  /** Preview — reference shows head(5) driver-side (simple_etl.py:173);
    * the lazy analogue is `limit`, which Catalyst pushes into the scan
    * (CollectLimit reads only the first partitions it needs).
    */
  def preview(df: DataFrame, n: Int = 5): DataFrame = df.limit(n)

  /** Deterministic top-k: total order + limit. Spark plans this as
    * TakeOrderedAndProject — a per-partition heap + single reduce, NOT a
    * full sort-shuffle, so it scales to any input size for small k.
    */
  def topK(df: DataFrame, k: Int, orderCols: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.orderBy(orderCols: _*).limit(k)

  /** Wide-to-long UNPIVOT (melt) — the inverse of [[pivotCount]] and
    * the scale-safe half of [[transpose]]: id columns are repeated,
    * each measure column becomes a (metric, value) row. Spark 4's
    * native `Dataset.unpivot` is a zero-shuffle map-side expansion
    * (one Expand node — each input row emits |measures| output rows in
    * place), so it composes into any downstream plan without a
    * repartition. Measure columns must share a common type, as in SQL
    * UNPIVOT.
    */
  def unpivot(df: DataFrame, ids: Seq[String], measures: Seq[String],
      metricName: String = "metric", valueName: String = "value"): DataFrame =
    df.unpivot(ids.map(col).toArray, measures.map(col).toArray, metricName, valueName)
}
