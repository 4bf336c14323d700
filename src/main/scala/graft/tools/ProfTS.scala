package graft.tools
import org.apache.spark.sql.SparkSession
object ProfTS {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val names = Seq("q_tpch_q2", "q_bloom_join", "e_pca_top2", "q_hits", "q_kcore",
      "q_tpch_q5", "q_tpch_q18", "d_curate_final", "d_dedup_keep", "q_brand_triples",
      "d_cluster_sizes", "e_pca_top", "q_ref_integrity", "d_pagerank")
    names.foreach { n => // warm at sf0.001
      try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => println(s"[prof] warm $n FAILED ${e.getMessage}") }
    }
    names.foreach { n =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir).write.mode("overwrite").format("noop").save()
      val t1 = (System.nanoTime()-t0)/1e9
      val t2 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir).write.mode("overwrite").format("noop").save()
      val t3 = (System.nanoTime()-t2)/1e9
      println(f"[prof] $n%-20s rep1 $t1%.3f  rep2 $t3%.3f")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
