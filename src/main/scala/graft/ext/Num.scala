package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Numeric helpers shared by the extension operators. */
object Num {
  /** Cross-engine-safe 4-decimal reduction: floor(x*1e4)/1e4 performs
    * the identical IEEE double ops in any engine, so equal inputs give
    * bit-equal outputs. round(x,4) does NOT have this property (Spark
    * rounds the exact binary value, DuckDB rounds the x*1e4 product;
    * they disagree whenever that multiply crosses the .5 boundary —
    * caught live on the quality score at sf0.1).
    */
  def trunc4(c: Column): Column = floor(c * lit(10000.0)) / lit(10000.0)
}
