package graft.tools
import org.apache.spark.sql.SparkSession
object ProfTS {
  def main(args: Array[String]): Unit = {
    val aqe = sys.env.getOrElse("PROF_AQE", "true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val names = Seq("q1_pricing_summary","q_revenue_by_nation","t9_join_inner","t2_dedup",
      "d_minhash_lsh","d_dedup_clusters","d_curate_final","q_tpch_q5","q_tpch_q18",
      "q_window_running","q_events_daily","q_funnel","d_lang_id","d_quality_score",
      "e_cosine_topk","q_brand_triples","q_hits","q_kcore","d_ngram_jaccard","q_bloom_join")
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => println(s"[prof] warm $n FAILED") }
    }
    var total = 0.0
    names.foreach { n =>
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime()-t0)/1e9
      }.sorted
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val med = ts(1)
      total += med
      println(f"[prof] $n%-22s $med%.3f")
    }
    println(f"[prof] TOTAL(aqe=$aqe) $total%.3f")
    spark.stop()
  }
}
