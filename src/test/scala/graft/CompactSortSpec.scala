package graft

import org.apache.spark.sql.functions._

/** CompactResultSortRule: the query-final global sort must plan as a
  * single-partition local sort (no range exchange, hence no sampling
  * job) when shuffle partitions are volume-sized small, while top-k
  * sorts keep their TakeOrderedAndProject fusion and the rewrite stays
  * behind its conf gate.
  */
class CompactSortSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("final orderBy plans without a range exchange, same total order") {
    val agg = t("customer")
      .groupBy(col("c_mktsegment")).agg(sum(col("c_acctbal")).as("bal"))
    val sorted = agg.orderBy(col("bal").desc, col("c_mktsegment"))
    val p = planOf(sorted)
    assert(!p.contains("rangepartitioning"),
      s"compact sort should not range-partition, plan:\n${p.take(800)}")

    val got = sorted.collect().map(r => (r.getString(0), r.getDouble(1)))
    // reference order computed with the rule disabled
    spark.conf.set("spark.graft.compactSort", "false")
    try {
      val ref = agg.orderBy(col("bal").desc, col("c_mktsegment"))
      assert(planOf(ref).contains("rangepartitioning"),
        "conf gate must restore the range-partitioned sort")
      assert(got.toSeq == ref.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq)
    } finally spark.conf.unset("spark.graft.compactSort")
  }

  test("sort+limit keeps TakeOrderedAndProject fusion") {
    val topk = t("customer")
      .orderBy(col("c_acctbal").desc).limit(5)
    val p = planOf(topk)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must stay fused, plan:\n${p.take(800)}")
    assert(topk.count() == 5)
  }

  test("large-frame final sorts keep the parallel range sort") {
    // an unpivot-style Expand over the fact table sorts millions of
    // rows at bench scale — the stats gate must leave it range-parted
    spark.conf.set("spark.graft.compactSortMaxBytes", "1024")
    try {
      val big = t("lineitem")
        .orderBy(col("l_orderkey"), col("l_linenumber"))
      val p = planOf(big)
      assert(p.contains("rangepartitioning"),
        s"stats gate must skip large frames, plan:\n${p.take(800)}")
    } finally spark.conf.unset("spark.graft.compactSortMaxBytes")
  }

  test("malformed compactSortMaxBytes degrades to the default gate, never throws") {
    spark.conf.set("spark.graft.compactSortMaxBytes", "not-a-number")
    try {
      // planning must succeed, and the small frame still takes the
      // compact path (the default 8 MB gate applies)
      val p = planOf(t("nation").orderBy(col("n_nationkey")))
      assert(!p.contains("rangepartitioning"),
        s"default gate should apply under a bad conf value, plan:\n${p.take(800)}")
    } finally spark.conf.unset("spark.graft.compactSortMaxBytes")
  }

  test("mid-plan sorts and large-partition sessions are untouched") {
    // the rule only ever fires when shuffle partitions <= 16 — at
    // cluster scale (volume-sized partitions in the hundreds+) the
    // parallel range sort must be preserved
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      val p = planOf(t("customer").orderBy(col("c_custkey")))
      assert(p.contains("rangepartitioning"),
        s"rule must not fire at 64 shuffle partitions, plan:\n${p.take(800)}")
    } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }
}
