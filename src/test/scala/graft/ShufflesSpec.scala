package graft

import org.apache.spark.sql.functions._

/** graft.ops.Shuffles.pinWide: the scale contract is that the pin only
  * ever EXCLUDES the small-volume degenerate coalesce — it must fire
  * only below the size threshold (width x advisory partition size),
  * leave genuinely large inputs to the planner + AQE, preserve the
  * data exactly, and disappear entirely under its conf gate.
  */
class ShufflesSpec extends SparkSpec {

  private def numParts(df: org.apache.spark.sql.DataFrame): Int =
    df.rdd.getNumPartitions

  test("pinWide resolves to max(cores, configured shuffle partitions)") {
    val base = t("orders").select(col("o_orderkey"), col("o_custkey"))
    // test session: local[4] cores, 4 shuffle partitions -> width 4
    assert(numParts(ops.Shuffles.pinWide(base, col("o_custkey"))) == 4)
    // cluster-sized session conf: 64 shuffle partitions -> the pin IS
    // the planner's own width, nothing changes at scale
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try assert(numParts(ops.Shuffles.pinWide(base, col("o_custkey"))) == 64)
    finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  test("pinWide preserves rows and clusters by the key") {
    val base = t("orders").select(col("o_orderkey"), col("o_custkey"))
    val pinned = ops.Shuffles.pinWide(base, col("o_custkey"))
    assert(pinned.count() == base.count())
    // same key never lands in two partitions (hash clustering)
    val spread = pinned
      .groupBy(col("o_custkey"), spark_partition_id().as("p")).count()
      .groupBy(col("o_custkey")).count().filter(col("count") > 1).count()
    assert(spread == 0L, "a key must map to exactly one partition")
  }

  test("pinWide leaves genuinely large inputs to the planner (scale contract)") {
    // ~80 GB size estimate (Range leaf stats), never executed: above
    // width x advisoryPartitionSize the pin must NOT fire — on a real
    // cluster it would bypass AQE coalescing / widen past the planner.
    val big = spark.range(10000000000L).toDF("id")
    val df = ops.Shuffles.pinWide(big, col("id"))
    assert(df.queryExecution.logical eq big.queryExecution.logical,
      "a large input must be returned unchanged")
  }

  test("spark.graft.pinWide=false drops the pin entirely") {
    val base = t("orders").select(col("o_orderkey"), col("o_custkey"))
    spark.conf.set("spark.graft.pinWide", "false")
    try {
      val df = ops.Shuffles.pinWide(base, col("o_custkey"))
      assert(df.queryExecution.logical eq base.queryExecution.logical,
        "gate off must return the input plan unchanged")
    } finally spark.conf.unset("spark.graft.pinWide")
  }

  // clusterByKey is the CORRECTNESS variant: consumers are mapPartitions
  // kernels with no planner exchange of their own, so unlike pinWide it
  // must exchange on EVERY path — gate off and above-threshold included.

  test("clusterByKey still clusters with the pin gate off") {
    val base = t("orders").select(col("o_orderkey"), col("o_custkey"))
      .repartition(4, col("o_orderkey")) // pre-scattered by the wrong key
    spark.conf.set("spark.graft.pinWide", "false")
    try {
      val df = ops.Shuffles.clusterByKey(base, col("o_custkey"))
      val spread = df
        .groupBy(col("o_custkey"), spark_partition_id().as("p")).count()
        .groupBy(col("o_custkey")).count().filter(col("count") > 1).count()
      assert(spread == 0L, "a key must map to exactly one partition even with the pin off")
    } finally spark.conf.unset("spark.graft.pinWide")
  }

  test("clusterByKey exchanges even above the size threshold") {
    val big = spark.range(10000000000L).toDF("id")
    val df = ops.Shuffles.clusterByKey(big, col("id"))
    assert(!(df.queryExecution.logical eq big.queryExecution.logical),
      "above-threshold input must still get a keyed exchange")
    val reparts = df.queryExecution.logical.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression => r
    }
    assert(reparts.nonEmpty, "the exchange must be a keyed repartition")
  }
}
