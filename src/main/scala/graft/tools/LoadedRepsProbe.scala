package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-style 3-rep timing of named queries under synthetic
  * background CPU load — the round-7 verdict's load-robustness gate:
  * a query is robust when max-rep/min-rep < 3 with `burnThreads`
  * spinning alongside the 32 executor threads. Same per-query hygiene
  * as [[graft.Bench]] (clearCache + unpersist + gc between queries,
  * reps back-to-back within a query) so rep-1 artifact materialization
  * exposure shows up exactly as it does in the driver's artifact.
  *
  * Usage: runMain graft.tools.LoadedRepsProbe <sfDir> <burnThreads> <q1> <q2> ...
  */
object LoadedRepsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val burn = if (args.length > 1) args(1).toInt else 16
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("d_gram_coverage", "d_ngram_novelty", "d_curate_final")
    val spark = graft.Scratch.localFsConfs.foldLeft(SparkSession.builder().master("local[32]"))((b, kv) => b.config(kv._1, kv._2))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.local.dir", graft.Scratch.dir())
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Warm at smoke scale like Bench does, then prewarm shared artifacts
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"warmup $n: ${e.getMessage}") }
    }
    graft.SparkEntry.prewarmArtifacts(spark, dir)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val burners = (1 to burn).map { i =>
      val t = new Thread(() => {
        var x = 0L
        while (!stop.get()) { x += java.lang.Long.rotateLeft(x ^ 0x9e3779b9L, 13) + 1 }
        if (x == 42L) println(x)
      }, s"burn-$i")
      t.setDaemon(true); t.start(); t
    }
    for (n <- names) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      val ratio = times.max / times.min
      println(f"[loaded] burn=$burn $n%-22s reps=${times.map(t => f"$t%.2f").mkString(",")} maxmin=$ratio%.2f ${if (ratio < 3) "OK" else "FRAGILE"}")
    }
    stop.set(true); burners.foreach(_.join(1000))
    spark.stop()
  }
}
