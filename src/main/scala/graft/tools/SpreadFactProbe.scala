package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B: fact-table scan spread vs as-is for single-stage relational
  * plans over the single-row-group fixture (scan stages are 1-task, so
  * broadcast-join+agg pipelines run on one core while 31 idle).
  * Interleaved warm reps inside one JVM, medians printed.
  */
object SpreadFactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.local.dir", graft.Scratch.dir())
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def rd(t: String) = graft.Tables.read(spark, dir, t)
    def timeIt(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def ab(name: String, plain: => org.apache.spark.sql.DataFrame,
        sprd: => org.apache.spark.sql.DataFrame): Unit = {
      timeIt(plain); timeIt(sprd)
      val ps = (1 to 3).map(_ => (timeIt(plain), timeIt(sprd)))
      println(f"[spread] $name%-16s plain=${med(ps.map(_._1))}%.3f spread=${med(ps.map(_._2))}%.3f")
    }
    ab("q_hhi",
      graft.ext.Aggregates.herfindahlByNation(
        rd("lineitem"), rd("orders"), rd("customer"), rd("nation"), rd("part")),
      graft.ext.Aggregates.herfindahlByNation(
        graft.Tables.spread(rd("lineitem")), rd("orders"), rd("customer"),
        rd("nation"), rd("part")))
    ab("q1_pricing",
      graft.ext.Aggregates.pricingSummary(rd("lineitem")),
      graft.ext.Aggregates.pricingSummary(graft.Tables.spread(rd("lineitem"))))
    ab("q_abc",
      graft.ext.Aggregates.abcClassification(rd("lineitem")),
      graft.ext.Aggregates.abcClassification(graft.Tables.spread(rd("lineitem"))))
    ab("q_tpch_q5",
      graft.ext.Aggregates.localSupplierVolume(
        rd("customer"), rd("orders"), rd("lineitem"),
        rd("supplier"), rd("nation"), rd("region")),
      graft.ext.Aggregates.localSupplierVolume(
        rd("customer"), rd("orders"), graft.Tables.spread(rd("lineitem")),
        rd("supplier"), rd("nation"), rd("region")))
    ab("q_tpch_q9",
      graft.ext.Tpch.q9ProductProfit(rd("part"), rd("supplier"),
        rd("lineitem"), rd("orders"), rd("nation")),
      graft.ext.Tpch.q9ProductProfit(rd("part"), rd("supplier"),
        graft.Tables.spread(rd("lineitem")), rd("orders"), rd("nation")))
    ab("q_tpch_q21",
      graft.ext.Tpch.q21WaitingSuppliers(rd("supplier"), rd("lineitem"), rd("orders")),
      graft.ext.Tpch.q21WaitingSuppliers(rd("supplier"),
        graft.Tables.spread(rd("lineitem")), rd("orders")))
    ab("q_elasticity",
      graft.ext.Aggregates.priceElasticity(rd("lineitem"), rd("part")),
      graft.ext.Aggregates.priceElasticity(
        graft.Tables.spread(rd("lineitem")), rd("part")))
    ab("q_winsorize",
      graft.ext.Aggregates.winsorizedMean(rd("lineitem"), "l_extendedprice", "l_returnflag"),
      graft.ext.Aggregates.winsorizedMean(
        graft.Tables.spread(rd("lineitem")), "l_extendedprice", "l_returnflag"))
    ab("q_zscore",
      graft.ext.Aggregates.zscoreNormalize(rd("lineitem"), "l_returnflag", "l_quantity"),
      graft.ext.Aggregates.zscoreNormalize(
        graft.Tables.spread(rd("lineitem")), "l_returnflag", "l_quantity"))
    ab("q_decile_lift",
      graft.ext.Aggregates.decileLift(rd("customer"), rd("orders")),
      graft.ext.Aggregates.decileLift(rd("customer"), graft.Tables.spread(rd("orders"))))
    ab("q_percentile_ladder",
      graft.ext.Aggregates.customerSpendPercentiles(rd("orders")),
      graft.ext.Aggregates.customerSpendPercentiles(graft.Tables.spread(rd("orders"))))
    ab("q_peak_concurrency",
      graft.ext.Events.peakConcurrency(rd("events")),
      graft.ext.Events.peakConcurrency(graft.Tables.spread(rd("events"))))
    spark.stop()
  }
}
