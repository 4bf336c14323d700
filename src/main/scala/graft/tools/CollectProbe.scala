package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the driver fast-path edge collect: row-based limit+collect
  * (current probeCollect) vs a chunk-packed mapPartitions collect that
  * ships few big binary rows instead of |E| Row objects.
  */
object CollectProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Scratch.localFsConfs.foldLeft(SparkSession.builder().master("local[32]"))((b, kv) => b.config(kv._1, kv._2))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.local.dir", graft.Scratch.dir())
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def eProj = graft.Tables.read(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(graft.Tables.read(spark, dir, "lineitem").select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("src"), col("l_partkey").cast("long").as("dst"))
    def time(label: String)(f: => Long): Unit = {
      val xs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = xs.map(_._1).sorted.apply(2)
      println(f"[collect] $label%-28s med=${med}%.3f n=${xs.head._2}")
    }
    // warm
    eProj.write.mode("overwrite").format("noop").save()
    time("noop-write") { eProj.write.mode("overwrite").format("noop").save(); 0L }
    time("row limit+collect") {
      val prev = spark.conf.getOption("spark.sql.limit.initialNumPartitions")
      spark.conf.set("spark.sql.limit.initialNumPartitions", "4096")
      try eProj.limit(1000001).collect().length.toLong
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.limit.initialNumPartitions", v)
        case None    => spark.conf.unset("spark.sql.limit.initialNumPartitions")
      }
    }
    time("typed collect") { eProj.as[(Long, Long)].collect().length.toLong }
    time("chunk-packed collect") {
      val max = 1000000
      val chunks = eProj.as[(Long, Long)].mapPartitions { it =>
        val buf = new scala.collection.mutable.ArrayBuffer[Array[Long]]
        var cur = new Array[Long](2 * 65536); var n = 0; var total = 0
        var overflow = false
        while (it.hasNext && !overflow) {
          val (s, d) = it.next()
          cur(n) = s; cur(n + 1) = d; n += 2; total += 1
          if (total > max) overflow = true
          else if (n == cur.length) { buf += cur; cur = new Array[Long](2 * 65536); n = 0 }
        }
        if (n > 0) buf += java.util.Arrays.copyOf(cur, n)
        if (overflow) Iterator((true, Array.empty[Long]))
        else buf.iterator.map((false, _))
      }.collect()
      if (chunks.exists(_._1)) -1L
      else chunks.map(_._2.length.toLong).sum / 2
    }
    // driver loop cost on top of the packed collect (full q_hits fast path shape)
    time("packed + hits loop") {
      val chunks = eProj.as[(Long, Long)].mapPartitions { it =>
        val buf = new scala.collection.mutable.ArrayBuffer[Array[Long]]
        var cur = new Array[Long](2 * 65536); var n = 0
        while (it.hasNext) {
          val (s, d) = it.next()
          cur(n) = s; cur(n + 1) = d; n += 2
          if (n == cur.length) { buf += cur; cur = new Array[Long](2 * 65536); n = 0 }
        }
        if (n > 0) buf += java.util.Arrays.copyOf(cur, n)
        buf.iterator
      }.collect()
      val n = chunks.map(_.length).sum / 2
      val srcA = new Array[Long](n); val dstA = new Array[Long](n)
      var w = 0
      chunks.foreach { c =>
        var i = 0
        while (i < c.length) { srcA(w) = c(i); dstA(w) = c(i + 1); w += 1; i += 2 }
      }
      n.toLong
    }
    spark.stop()
  }
}
