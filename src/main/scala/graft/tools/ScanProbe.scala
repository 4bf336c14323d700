package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"[probe] $tag%-28s ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    // correctness: int128 path vs decimal path must agree exactly
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val disc1 = (lit(1d) - col("l_discount")).cast("decimal(4,2)")
    val tax1  = (lit(1d) + col("l_tax")).cast("decimal(4,2)")
    val oldQ = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_base_price"),
        sum(price * disc1).cast("double").as("sum_disc_price"),
        sum(price * disc1 * tax1).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    val newQ = graft.ext.Aggregates.pricingSummary(li)
    val a = oldQ.collect().map(_.toSeq).toSeq
    val b = newQ.collect().map(_.toSeq).toSeq
    println(s"[probe] exact-match=${a == b}")
    if (a != b) { println(a.mkString("\n")); println("----"); println(b.mkString("\n")) }
    time("q1-decimal-agg") { oldQ.write.mode("overwrite").format("noop").save() }
    time("q1-int128-agg") { newQ.write.mode("overwrite").format("noop").save() }
    spark.stop()
  }
}
