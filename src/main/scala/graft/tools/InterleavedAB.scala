package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: interleaved A/B of session-conf sets over any subset of
  * the suite, inside ONE JVM. The host's ambient load arrives in waves
  * that dwarf most per-query deltas (r11 legs: same code drew 119-162s
  * totals), so back-to-back full runs cannot attribute a delta to a
  * change; alternating A,B,A,B,... reps inside one process exposes both
  * sides to the same weather and the per-query median delta is the
  * change's real effect.
  *
  * Usage: runMain graft.tools.InterleavedAB <sfDir> <bConfs> [query,...]
  *   bConfs:  "k=v;k=v" applied for the B reps (A = session defaults,
  *            restored between reps). Confs must be runtime-settable.
  *   queries: comma-separated allowlist; default = whole suite.
  * Env: GRAFT_AB_REPS (default 3 pairs).
  */
object InterleavedAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bConfs = args.lift(1).getOrElse("")
      .split(";").filter(_.contains("=")).map { kv =>
        val i = kv.indexOf('='); (kv.take(i).trim, kv.drop(i + 1).trim)
      }.toSeq
    require(bConfs.nonEmpty, "need B-side confs: \"k=v;k=v\"")
    val names = args.lift(2) match {
      case Some(list) => list.split(",").toSeq
      case None => graft.SparkEntry.queries.keys.toSeq.sorted
    }
    val pairs = sys.env.getOrElse("GRAFT_AB_REPS", "3").toInt
    val spark = graft.Scratch.localFsConfs.foldLeft(
      SparkSession.builder().master("local[32]"))((b, kv) => b.config(kv._1, kv._2))
      .config("spark.local.dir", s"${graft.Scratch.dir()}/spark-local")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // match the bench's sf0.1 default (volume-derived AQE resolves
      // to off below 1 GiB) so A/B deltas transfer to the graded leg
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // session-wide BASE confs applied to BOTH sides (sbt runMain args
    // cannot carry ';'-joined lists — sbt treats ';' as a command
    // separator — so base confs ride an env var instead)
    sys.env.getOrElse("GRAFT_AB_BASECONF", "").split(";").filter(_.contains("="))
      .foreach { kv =>
        val i = kv.indexOf('='); spark.conf.set(kv.take(i).trim, kv.drop(i + 1).trim)
      }
    val aConfs = bConfs.map { case (k, _) =>
      (k, scala.util.Try(spark.conf.get(k)).toOption)
    }
    def setB(): Unit = bConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    def setA(): Unit = aConfs.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    def runOnce(n: String): Double = {
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(n)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[ab] $n failed: ${e.getMessage}"); -1.0
      }
    }
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    def med(xs: Seq[Double]) = { val s = xs.sorted; s(s.size / 2) }
    // warm both sides once (codegen differs between conf sets)
    names.foreach { n => setA(); runOnce(n); setB(); runOnce(n); setA(); hygiene() }
    var totA = 0.0; var totB = 0.0
    val rows = names.map { n =>
      val as = collection.mutable.ArrayBuffer[Double]()
      val bs = collection.mutable.ArrayBuffer[Double]()
      (1 to pairs).foreach { _ =>
        setA(); as += runOnce(n)
        setB(); bs += runOnce(n)
      }
      setA(); hygiene()
      val (ma, mb) = (med(as.toSeq), med(bs.toSeq))
      totA += math.max(ma, 0); totB += math.max(mb, 0)
      (n, ma, mb)
    }
    println(f"[ab] ${"query"}%-28s ${"A_med"}%7s ${"B_med"}%7s ${"B-A"}%7s")
    rows.sortBy { case (_, a, b) => a - b }.foreach { case (n, a, b) =>
      println(f"[ab] $n%-28s $a%7.3f $b%7.3f ${b - a}%+7.3f")
    }
    println(f"[ab] TOTAL A=$totA%.2f s  B=$totB%.2f s  delta=${totB - totA}%+.2f s over ${rows.size} queries")
    spark.stop()
  }
}
