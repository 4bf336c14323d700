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

  /** 8-decimal variant of [[trunc4]], for snapping libm-derived
    * INTERMEDIATE values (ln, sqrt outputs) onto a shared grid before
    * they enter cross-engine summations: a ≤1-ulp libm difference can
    * only survive the snap if the value lands within a ulp of a grid
    * boundary (~1e-8 probability per value).
    */
  def trunc8(c: Column): Column = floor(c * lit(1.0e8)) / lit(1.0e8)
}
