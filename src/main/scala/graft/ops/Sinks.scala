package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Load-stage sinks (reference: simple_etl.py:356-404, SURVEY.md §2.3).
  */
object Sinks {

  /** K1 — Parquet write (reference: simple_etl.py:369-372 via pandas
    * buffer). Distributed writer; optional partition columns for
    * partition-pruned downstream reads — the single most important knob
    * for a 100 TB table that is always filtered by date/tenant.
    */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): DataFrame = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
    df
  }

  /** K2 — delimited-text write, HDFS-transparent (reference:
    * simple_etl.py:374-388 drops to `rdd.map(",".join)` with NO quoting —
    * SURVEY.md §2.3 says do not reproduce that bug). `DataFrameWriter.csv`
    * quotes and escapes properly and accepts `hdfs://` URIs natively.
    */
  def csv(df: DataFrame, path: String, header: Boolean = false): DataFrame = {
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)
    df
  }

  /** K3 — JDBC write (reference: simple_etl.py:390-404,
    * `to_sql(if_exists='replace')` => overwrite). Interface-complete;
    * needs a driver jar at runtime (absent offline, SURVEY.md §7).
    */
  def jdbc(df: DataFrame, url: String, table: String, props: Map[String, String] = Map.empty): DataFrame = {
    val base = df.write.mode(SaveMode.Overwrite).format("jdbc")
      .option("url", url).option("dbtable", table)
    props.foldLeft(base) { case (w, (k, v)) => w.option(k, v) }.save()
    df
  }
}
