package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B `spark.graft.gramCoverage.legacy` inside ONE JVM, optionally
  * under synthetic background CPU load: interleaved reps with the
  * hash-agg shape (off) and the collect_set/ObjectHashAggregate shape
  * (on), medians of each, so session-level drift hits both arms
  * equally — the same discipline as [[PinToggleProbe]]. The load arm
  * reproduces the r7 driver pathology (d_gram_coverage reps
  * [1.8s, 51.0s, 20.2s] on a loaded host vs 0.7s quiesced) without
  * waiting for host weather.
  *
  * Usage: runMain graft.tools.GramToggleProbe <sfDir> <burnThreads> [reps]
  */
object GramToggleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val burn = if (args.length > 1) args(1).toInt else 0
    val reps = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.local.dir", graft.Scratch.dir())
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val burners = (1 to burn).map { i =>
      val t = new Thread(() => {
        var x = 0L
        while (!stop.get()) { x += java.lang.Long.rotateLeft(x ^ 0x9e3779b9L, 13) + 1 }
        if (x == 42L) println(x) // keep the loop un-eliminable
      }, s"burn-$i")
      t.setDaemon(true); t.setPriority(Thread.NORM_PRIORITY); t.start(); t
    }
    def run(legacy: Boolean): Double = {
      spark.conf.set("spark.graft.gramCoverage.legacy", legacy.toString)
      val df = graft.SparkEntry.queries("d_gram_coverage")(spark, dir)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      dt
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    run(legacy = false); run(legacy = true) // warm both plans
    val pairs = (1 to reps).map(_ => (run(legacy = false), run(legacy = true)))
    stop.set(true); burners.foreach(_.join(1000))
    val on = pairs.map(_._2); val off = pairs.map(_._1)
    println(f"[gram] burn=$burn hashagg med=${med(off)}%.3f reps=${off.map(t => f"$t%.2f").mkString(",")}")
    println(f"[gram] burn=$burn legacy  med=${med(on)}%.3f reps=${on.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
