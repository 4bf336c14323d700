package graft.tools

import org.apache.spark.sql.SparkSession

/** Split per-query wall time into PLAN (analysis+optimization+physical
  * planning, forced via executedPlan) and EXEC (the noop write given a
  * planned Dataset) for representative queries — tells whether the
  * suite's fixed overhead is Catalyst CPU or runtime stages.
  */
object PlanCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_hhi", "q1_pricing_summary", "q_tpch_q18", "q_session_overlap",
        "q_price_index", "d_minhash_lsh", "t9_join_inner", "q_window_range")
    val spark = graft.Scratch.localFsConfs.foldLeft(SparkSession.builder().master("local[32]"))((b, kv) => b.config(kv._1, kv._2))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.local.dir", graft.Scratch.dir())
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional conf overrides for A/B runs: GRAFT_PROBE_CONF="k=v;k=v"
    sys.env.getOrElse("GRAFT_PROBE_CONF", "").split(";").filter(_.contains("="))
      .foreach { kv =>
        val i = kv.indexOf('='); spark.conf.set(kv.take(i).trim, kv.drop(i + 1).trim)
      }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    for (n <- names) {
      def build() = graft.SparkEntry.queries(n)(spark, dir)
      build().write.mode("overwrite").format("noop").save() // warm
      val plans = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = build()
        df.queryExecution.executedPlan // forces the whole plan pipeline
        (System.nanoTime() - t0) / 1e9
      }
      val totals = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        build().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[plancost] $n%-20s plan=${med(plans)}%.3f total=${med(totals)}%.3f")
    }
    spark.stop()
  }
}
