package graft

import org.apache.spark.sql.functions._
import graft.ext.Tpch

/** Semantics tests for the fixture-adapted TPC-H remainder
  * (graft.ext.Tpch) on sf0.001 — each of the tricky correlation shapes
  * is cross-checked against an independently-formulated computation, so
  * a bug in the join/window rewrite can't hide in the shared code path.
  * (Value-level parity vs DuckDB is the driver's oracle gate; these
  * tests guard the rewrites themselves.)
  */
class TpchSpec extends SparkSpec {

  test("q4: each qualifying order counted exactly once (semi join, not inner)") {
    val out = Tpch.q4OrderPriority(t("orders"), t("lineitem"))
    // independent formulation: inner join then distinct orderkeys
    val o = t("orders").filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
      col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
    val expected = o.join(t("lineitem"), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("o_orderkey"), col("o_orderpriority")).distinct()
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("order_count"))
    val got = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = expected.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp)
    assert(got.values.sum > 0)
  }

  test("q13: histogram covers every customer exactly once (left join keeps zero bucket)") {
    val out = Tpch.q13CustomerDistribution(t("customer"), t("orders")).collect()
    val totalCustomers = out.map(_.getLong(1)).sum
    assert(totalCustomers == t("customer").count())
  }

  test("q15: every returned supplier has exactly the max revenue") {
    val rows = Tpch.q15TopSupplier(t("lineitem"), t("supplier")).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length == 1)
  }

  test("q17: window-average rewrite equals the two-pass groupBy+join formulation") {
    val out = Tpch.q17SmallQuantityRevenue(t("lineitem"), t("part")).collect()(0)
    // independent: per-part avg via aggregate, joined back
    val p = t("part").filter(col("p_brand") === "Brand#3" && col("p_type") === "SMALL")
      .select(col("p_partkey"))
    val li = t("lineitem").join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val avgs = li.groupBy(col("l_partkey").as("k"))
      .agg((sum(col("l_quantity").cast("decimal(18,4)")).cast("double") /
        count(lit(1))).as("avg_qty"))
    val exp = li.join(avgs, col("l_partkey") === col("k"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(graft.ext.Num.trunc4(sum(col("l_extendedprice").cast("decimal(18,4)"))
          .cast("double") / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
      .collect()(0)
    assert(out.getLong(1) == exp.getLong(1))
    if (out.getLong(1) > 0) assert(out.getDouble(0) == exp.getDouble(0))
  }

  test("q19: manual dimension/quantity prefilters do not change the disjunctive result") {
    val out = Tpch.q19DiscountedRevenue(t("lineitem"), t("part")).collect()(0)
    // naive formulation: join everything, filter after
    val pairPred =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    val exp = t("lineitem").join(t("part"), col("l_partkey") === col("p_partkey"))
      .filter(pairPred)
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .collect()(0)
    assert(out.getLong(1) == exp.getLong(1))
  }

  test("q21: semi/anti pair — every counted line is late, on a multi-supplier order, sole late supplier") {
    val orders = t("orders"); val lineitem = t("lineitem")
    val out = Tpch.q21WaitingSuppliers(t("supplier"), lineitem, orders)
    val total = out.agg(sum(col("numwait"))).collect()(0).getLong(0)
    // independent formulation via per-order aggregates: for each (orderkey),
    // the set of suppliers and the set of LATE suppliers; a line counts iff
    // |suppliers| > 1 and lateSuppliers == {this supplier}.
    val late = lineitem
      .join(orders.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late",
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")).cast("int"))
    val perOrder = late.groupBy(col("l_orderkey").as("k"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("is_late") === 1, col("l_suppkey"))).as("n_late_supp"))
    val exp = late.filter(col("is_late") === 1)
      .join(perOrder, col("l_orderkey") === col("k"))
      .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
      .count()
    assert(total == exp)
  }

  test("q22: dormant definition — no counted customer has a recent order") {
    val out = Tpch.q22DormantCustomers(t("customer"), t("orders"))
    val numcust = out.agg(sum(col("numcust"))).collect()(0).getLong(0)
    val recentCust = t("orders")
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    val nations = Seq(1, 3, 5, 7, 9, 11, 13)
    val inN = t("customer").filter(col("c_nationkey").isin(nations: _*))
    val avgBal = inN.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast("decimal(18,4)")).cast("double") /
        count(lit(1))).as("a")).collect()(0).getDouble(0)
    val exp = inN.filter(col("c_acctbal") > avgBal)
      .join(recentCust, col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(numcust == exp)
  }

  test("q14/q8 plans broadcast the pruned dimension side") {
    val q14Plan = Tpch.q14PromotionEffect(t("lineitem"), t("part"))
      .queryExecution.executedPlan.toString
    assert(q14Plan.contains("BroadcastHashJoin"), q14Plan.take(2000))
  }

  test("derived partsupp: 4 distinct suppliers per part, valid key range, deterministic") {
    val ps = Tpch.derivedPartsupp(t("part"), t("supplier")).cache()
    val nParts = t("part").count()
    val nSupp = t("supplier").count()
    assert(ps.count() == 4 * nParts)
    // supplier keys in range and distinct within each part
    val perPart = ps.groupBy(col("ps_partkey"))
      .agg(countDistinct(col("ps_suppkey")).as("k"),
        max(col("ps_suppkey")).as("mx"), min(col("ps_suppkey")).as("mn"))
    assert(perPart.filter(col("k") =!= 4).count() == 0)
    assert(perPart.filter(col("mx") >= nSupp || col("mn") < 0).count() == 0)
    // cost/qty bounds from the modular arithmetic
    assert(ps.filter(col("cost_cents") < 100 || col("cost_cents") > 99999).count() == 0)
    assert(ps.filter(col("ps_availqty") < 1 || col("ps_availqty") > 9999).count() == 0)
    ps.unpersist()
  }

  test("q2: every output row carries its part's minimum region-wide cost") {
    val out = Tpch.q2MinCostSupplier(t("part"), t("supplier"), t("nation"),
      t("region"), size = 15, typeName = "LARGE", regionName = "EUROPE")
    val rows = out.collect()
    if (rows.nonEmpty) {
      // independent min: groupBy over the same region-pruned partsupp
      val sr = t("supplier")
        .join(t("nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t("region").filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"))
      val minCost = Tpch.derivedPartsupp(t("part"), t("supplier"))
        .join(sr, col("ps_suppkey") === col("s_suppkey"))
        .groupBy(col("ps_partkey"))
        .agg((min(col("cost_cents")) / 100.0).as("mc"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      rows.foreach { r =>
        val (pk, cost) = (r.getLong(3), r.getDouble(5))
        assert(minCost(pk) == cost, s"part $pk: $cost != ${minCost(pk)}")
      }
    }
  }

  test("q11: parts above threshold; values sum consistent with the nation slice") {
    val out = Tpch.q11ImportantStock(t("part"), t("supplier"), t("nation"),
      nationName = "NATION_3", fracNum = 1, fracDenom = 1000).collect()
    assert(out.nonEmpty)
    // each returned value must exceed fraction * total of the full slice
    val supp = t("supplier")
      .join(t("nation").filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val totalCents = Tpch.derivedPartsupp(t("part"), t("supplier"))
      .join(supp, col("ps_suppkey") === col("s_suppkey"))
      .agg(sum(col("cost_cents") * col("ps_availqty")))
      .collect()(0).getLong(0)
    out.foreach { r =>
      assert(r.getDouble(1) * 100 * 1000 > totalCents.toDouble,
        s"part ${r.getLong(0)} below threshold")
    }
    // descending order
    val vals = out.map(_.getDouble(1))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
  }
}
