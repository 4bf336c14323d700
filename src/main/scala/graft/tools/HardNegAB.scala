package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: interleaved old-vs-new timing for the r11 one-pass
  * [[graft.ext.Similarity.hardNegatives]] rewrite, plus a row-level
  * equality check. The OLD shape (one knnJoin per distinct query label)
  * is inlined here so both run in one JVM under the same weather.
  */
object HardNegAB {
  private def oldHardNegatives(embeddings: DataFrame, nQueries: Int = 5, k: Int = 3): DataFrame = {
    val qs = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"), col("label"))
    val labels = qs.select(col("label").cast("int")).distinct()
      .collect().map(_.getInt(0)).sorted
    labels.map { l =>
      graft.ext.Similarity.knnJoin(
        embeddings.filter(col("vec_id") >= nQueries && col("label") =!= l),
        qs.filter(col("label") === l), k)
    }.reduce(_ unionAll _)
      .orderBy(col("query_id"), col("cos_sim").desc, col("vec_id"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Scratch.localFsConfs.foldLeft(
      SparkSession.builder().master("local[32]"))((b, kv) => b.config(kv._1, kv._2))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.local.dir", graft.Scratch.dir())
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.read(spark, dir, "embeddings")
    // row-level equality first
    val oldRows = oldHardNegatives(emb).collect().map(_.toString).toSeq
    val newRows = graft.ext.Similarity.hardNegatives(emb).collect().map(_.toString).toSeq
    println(s"[hnab] rows old=${oldRows.length} new=${newRows.length} equal=${oldRows == newRows}")
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(oldHardNegatives(emb)); time(graft.ext.Similarity.hardNegatives(emb)) // warm
    val (os, ns) = (collection.mutable.ArrayBuffer[Double](), collection.mutable.ArrayBuffer[Double]())
    (1 to 5).foreach { _ =>
      os += time(oldHardNegatives(emb))
      ns += time(graft.ext.Similarity.hardNegatives(emb))
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[hnab] old=${med(os.toSeq)}%.3f new=${med(ns.toSeq)}%.3f (medians of 5, interleaved)")
    spark.stop()
  }
}
