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
    // a fact-table scan is a narrow chain, so the byte bound decides —
    // over the bound it must keep the planner's range-parted sort
    spark.conf.set("spark.graft.compactSortMaxBytes", "1024")
    try {
      val big = t("lineitem")
        .orderBy(col("l_orderkey"), col("l_linenumber"))
      val p = planOf(big)
      assert(p.contains("rangepartitioning"),
        s"stats gate must skip large frames, plan:\n${p.take(800)}")
    } finally spark.conf.unset("spark.graft.compactSortMaxBytes")
  }

  test("row-sized finals (window/join over facts) keep the range sort") {
    import org.apache.spark.sql.expressions.Window
    // per-row frame behind a window: the old byte gate under-read this
    // shape (q_zscore class) — the shape gate must leave it range-parted
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
    val perRow = t("orders")
      .withColumn("rk", row_number().over(w))
      .orderBy(col("o_orderkey"))
    assert(planOf(perRow).contains("rangepartitioning"),
      "window-over-facts final must keep the parallel range sort")
    // row-sized join output: same
    val joined = t("orders").join(t("customer"),
        col("o_custkey") === col("c_custkey"))
      .orderBy(col("o_orderkey"))
    assert(planOf(joined).contains("rangepartitioning"),
      "fact-join final must keep the parallel range sort")
  }

  test("group-sized finals compact even when byte estimates are huge") {
    // join of two aggregates: size estimates multiply into junk, but
    // the frame is group-sized — the shape gate must compact it
    val a = t("orders").groupBy(col("o_orderstatus")).agg(sum(col("o_totalprice")).as("s1"))
    val b = t("orders").groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    val rpt = a.join(b, "o_orderstatus").orderBy(col("o_orderstatus"))
    val p = planOf(rpt)
    assert(!p.contains("rangepartitioning"),
      s"aggregate-join report must take the compact sort, plan:\n${p.take(800)}")
  }

  test("leaf-byte backstop vetoes group-sized shapes over big inputs") {
    // a per-key aggregate is group-sized by SHAPE, but if the leaves
    // feeding it exceed the backstop ceiling the gathered single-task
    // sort could be pathological — the rule must leave it range-parted
    spark.conf.set("spark.graft.compactSortLeafMaxBytes", "1024")
    try {
      val perKey = t("orders").groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice")).as("s"))
        .orderBy(col("o_custkey"))
      assert(planOf(perKey).contains("rangepartitioning"),
        "leaf-byte backstop must veto aggregates over big inputs")
    } finally spark.conf.unset("spark.graft.compactSortLeafMaxBytes")
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
