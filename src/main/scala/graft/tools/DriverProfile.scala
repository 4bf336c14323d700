package graft.tools

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev probe: sampling profiler for the DRIVER side of a query's noop
  * write. A daemon thread samples the main thread's stack every ~3ms
  * while the query executes in a loop; frames are aggregated bottom-up
  * by the deepest org.apache.spark / graft frame so the report names
  * the driver-side work (planning, codegen generation, file-partition
  * planning, broadcast build, job submission) that the stage waterfall
  * can only show as gaps.
  *
  * Usage: runMain graft.tools.DriverProfile <sfDir> <query> [loops=30]
  * Env: GRAFT_PROBE_CONF="k=v;k=v" conf overrides.
  */
object DriverProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val name = args(1)
    val loops = if (args.length > 2) args(2).toInt else 30
    val spark = graft.Scratch.localFsConfs.foldLeft(
      SparkSession.builder().master("local[32]"))((b, kv) => b.config(kv._1, kv._2))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.local.dir", graft.Scratch.dir())
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.getOrElse("GRAFT_PROBE_CONF", "").split(";").filter(_.contains("="))
      .foreach { kv =>
        val i = kv.indexOf('='); spark.conf.set(kv.take(i).trim, kv.drop(i + 1).trim)
      }
    def exec(): Unit =
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
    exec(); exec() // warm
    val main = Thread.currentThread()
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    var nSamples = 0
    val sampler = new Thread(() => {
      while (sampling) {
        val st = main.getStackTrace
        // label: the deepest frame in an "interesting" namespace, plus
        // its nearest enclosing spark entry point for context
        val frames = st.map(f => f.getClassName + "." + f.getMethodName)
        val deep = frames.find(f =>
          (f.startsWith("org.apache.spark") || f.startsWith("graft.") ||
            f.startsWith("org.apache.parquet") || f.startsWith("org.codehaus")) &&
            !f.contains("DriverProfile"))
          .getOrElse(frames.headOption.getOrElse("<empty>"))
        val anchor = frames.reverse.find(f =>
          f.contains("QueryExecution") || f.contains("SparkPlan") ||
            f.contains("DataFrameWriter") || f.contains("Dataset") ||
            f.contains("AdaptiveSparkPlan") || f.contains("SQLExecution"))
          .getOrElse("-")
        val key = deep + "  <=  " + anchor
        counts.merge(key, 1, (a, b) => a + b)
        nSamples += 1
        Thread.sleep(3)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    (1 to loops).foreach(_ => exec())
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    Thread.sleep(50)
    println(f"[drvprof] $name: $loops loops in $wall%.2f s (${wall / loops}%.3f s/exec), $nSamples samples")
    import scala.jdk.CollectionConverters._
    val top = counts.asScala.toSeq.sortBy(-_._2).take(40)
    top.foreach { case (k, c) =>
      println(f"[drvprof] ${c.toInt * 100.0 / nSamples}%5.1f%% $k")
    }
    spark.stop()
  }
}
