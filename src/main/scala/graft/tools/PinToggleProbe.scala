package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B graft.ops.Shuffles.pinWide per query inside ONE JVM: interleaved
  * reps with the pin on and off, medians of each, so session-level
  * drift (GC, code-cache warmup, ambient load) hits both arms equally.
  * Usage: runMain graft.tools.PinToggleProbe <sfDir> <q1> <q2> ...
  */
object PinToggleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("d_minhash_lsh", "d_keyphrases", "d_term_lift",
        "q_session_overlap", "e_knn_graph", "d_ngram_jaccard")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.local.dir", graft.Scratch.dir())
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String, on: Boolean): Double = {
      spark.conf.set("spark.graft.pinWide", on.toString)
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      dt
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    for (n <- names) {
      run(n, on = true); run(n, on = false) // warm both plans
      val pairs = (1 to sys.env.getOrElse("PIN_REPS","3").toInt).map(_ => (run(n, on = true), run(n, on = false)))
      System.gc()
      println(f"[pin] $n%-22s on=${med(pairs.map(_._1))}%.3f off=${med(pairs.map(_._2))}%.3f")
    }
    spark.stop()
  }
}
