package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Value-mutation transforms (reference: simple_etl.py:217-311,
  * SURVEY.md §2.2 T3/T4/T8 + intended regexp_replace surface).
  * All are narrow (no shuffle) and codegen-friendly — they fuse into the
  * enclosing WholeStageCodegen stage and push through to the scan where
  * Catalyst allows.
  */
object Mutation {

  /** T3 — replace-by-equality on one column:
    * `CASE WHEN col = old THEN new ELSE col END`
    * (reference: simple_etl.py:217-228). Comparison is as-is (string vs
    * column implies Spark's implicit cast), matching the final revision.
    */
  def replaceValue(df: DataFrame, column: String, oldV: String, newV: String): DataFrame =
    df.withColumn(column, when(col(column) === oldV, lit(newV)).otherwise(col(column)))

  /** T3b — regex replace. `regexp_replace` is imported-but-unused in the
    * reference (simple_etl.py:10) — SURVEY.md §2.2 calls it intended
    * surface, so it ships as a first-class op.
    */
  def regexReplace(df: DataFrame, column: String, pattern: String, replacement: String): DataFrame =
    df.withColumn(column, regexp_replace(col(column), pattern, replacement))

  /** T4 — filter rows whose `column` contains literal `value`
    * (reference: simple_etl.py:231-241). Case-sensitive; null rows drop
    * (null.contains -> null -> filtered) — both match the final Spark
    * revision (SURVEY.md §2.2 T4 semantics note).
    */
  def filterContains(df: DataFrame, column: String, value: String): DataFrame =
    df.filter(col(column).contains(value))

  /** T4b — case-insensitive contains, the checkpoint revision's
    * semantics (simple_etl-checkpoint.py:227 used pandas
    * `str.contains(case=False, na=False)`). Null rows drop, matching
    * `na=False`. lower() on both sides keeps the predicate codegen'd
    * and scan-pushable, like the case-sensitive variant.
    */
  def filterContainsIgnoreCase(df: DataFrame, column: String, value: String): DataFrame =
    df.filter(lower(col(column)).contains(value.toLowerCase))

  /** T8 — cast a column to one of the reference's four UI types
    * (reference: simple_etl.py:291-311). Requires
    * `spark.sql.ansi.enabled=false` session-wide so bad casts yield null
    * (the PySpark-4-as-configured behavior the reference ran with;
    * DuckDB oracle side uses TRY_CAST — SURVEY.md §7 risk register).
    */
  def castColumn(df: DataFrame, column: String, typeName: String): DataFrame = {
    val dt: DataType = typeName.toLowerCase match {
      case "string"             => StringType
      case "integer" | "int"    => IntegerType
      case "float"              => FloatType
      case "double"             => DoubleType
      case "long" | "bigint"    => LongType
      case "date"               => DateType
      case "timestamp"          => TimestampType
      case other                => sys.error(s"castColumn: unsupported type '$other'")
    }
    df.withColumn(column, col(column).cast(dt))
  }
}
