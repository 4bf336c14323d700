package graft.tools
import org.apache.spark.sql.SparkSession
object CCTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val pairs = graft.ext.Dedup.minhashDedup(docs).cache()
    pairs.count() // materialize candidates once so CC timing is CC-only
    for (r <- 1 to 3) {
      var t0 = System.nanoTime()
      graft.ext.Dedup.clusterPairsStar(pairs).write.mode("overwrite").format("noop").save()
      val star = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      graft.ext.Dedup.clusterPairs(pairs).write.mode("overwrite").format("noop").save()
      val prop = (System.nanoTime() - t0) / 1e9
      println(f"[cctime] rep $r star=$star%.2f prop=$prop%.2f")
    }
    spark.stop()
  }
}
