package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Analytic aggregates over the fixture star schema — the reference has
  * ZERO aggregations (SURVEY.md §2.4), but the BASELINE north-star
  * requires analytics queries, and any engine at 100 TB lives or dies on
  * its aggregate path.
  *
  * Numeric-determinism policy for oracle parity: aggregate SUMs are
  * computed over per-row `DECIMAL(18,4)` casts, never raw doubles —
  * decimal addition is exact and associative, so the result is
  * bit-identical regardless of partial-aggregation order across
  * partitions/engines. (A double sum is order-dependent; Spark's partial
  * aggregate order is nondeterministic at any parallelism > 1.)
  */
object Aggregates {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")

  /** TPC-H-Q1-shaped pricing summary over lineitem. Map-side partial
    * aggregation (hash agg) means the shuffle carries ~|groups| rows per
    * partition, not |input| — the canonical scale-safe aggregate shape.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame = {
    // Fixture prices/discounts/taxes are exact 2-decimal values, so cast
    // the INPUTS to decimal and multiply in decimal: every per-row
    // product is exact (no double->decimal rounding-mode divergence vs
    // DuckDB, whose half-even differs from Spark's half-up on computed
    // doubles).
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val disc1 = (lit(1d) - col("l_discount")).cast("decimal(4,2)")
    val tax1  = (lit(1d) + col("l_tax")).cast("decimal(4,2)")
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(price * disc1).cast("double").as("sum_disc_price"),
        sum(price * disc1 * tax1).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Revenue per nation: 3-way join where both dimension sides are
    * explicitly broadcast — at scale, `customer`/`nation` broadcast
    * while `orders` streams, so the plan has exactly zero shuffles
    * before the final small group-by.
    */
  def revenueByNation(orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("n_name"))

  /** Top-k customers by lifetime order value. TakeOrderedAndProject after
    * the aggregate: the sort never shuffles the full table.
    */
  def topCustomers(orders: DataFrame, customer: DataFrame, k: Int = 10): DataFrame =
    orders
      .groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("total_spend"), count(lit(1)).as("n_orders"))
      .join(broadcast(customer), col("o_custkey") === customer("c_custkey"))
      .select(col("o_custkey"), col("c_name"), col("total_spend"), col("n_orders"))
      .orderBy(col("total_spend").desc, col("o_custkey"))
      .limit(k)

  /** Exact + distinct counts per group. `countDistinct` implies a
    * two-phase shuffle (expand); `approx_count_distinct` (HLL) is the
    * scale path — single pass, fixed memory — exposed separately because
    * its result is engine-specific (see SparkEntry: rows-only check).
    */
  def orderStats(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .orderBy(col("o_orderstatus"))

  def orderStatsApprox(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderstatus"))
      .agg(approx_count_distinct(col("o_custkey")).as("approx_customers"))
      .orderBy(col("o_orderstatus"))

  /** Window function: rank orders within each customer, keep each
    * customer's single largest order. One shuffle on the partition key.
    */
  def largestOrderPerCustomer(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice").as("top_price"))
      .orderBy(col("o_custkey"))
  }

  /** Revenue by part brand: fact-to-dimension join where the dimension
    * (part) broadcasts and the fact (lineitem) streams — the canonical
    * star-schema aggregate. Exact-decimal revenue (input-cast, see
    * pricingSummary).
    */
  def revenueByBrand(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val disc1 = (lit(1d) - col("l_discount")).cast("decimal(4,2)")
    lineitem
      .join(broadcast(part), lineitem("l_partkey") === part("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(price * disc1).cast("double").as("revenue"),
        count(lit(1)).as("n_items"),
        countDistinct(col("l_partkey")).as("n_parts"))
      .orderBy(col("p_brand"))
  }

  /** Supplier league table: per-supplier shipped value joined back to
    * nation, top-k by value — fact aggregate first (shrinks to
    * |suppliers| rows), dimensions broadcast after.
    */
  def topSuppliers(lineitem: DataFrame, supplier: DataFrame, nation: DataFrame, k: Int = 15): DataFrame = {
    val price = col("l_extendedprice").cast("decimal(12,2)")
    lineitem
      .groupBy(col("l_suppkey"))
      .agg(sum(price).cast("double").as("total_value"), count(lit(1)).as("n_lines"))
      .join(broadcast(supplier), col("l_suppkey") === supplier("s_suppkey"))
      .join(broadcast(nation), supplier("s_nationkey") === nation("n_nationkey"))
      .select(col("l_suppkey"), col("s_name"), col("n_name"), col("total_value"), col("n_lines"))
      .orderBy(col("total_value").desc, col("l_suppkey"))
      .limit(k)
  }

  /** Exact percentiles of order value per status. Spark's `percentile`
    * is the exact sort-based aggregate (use approx_percentile at true
    * scale — t-digest, single pass, fixed memory); trunc4 keeps the
    * interpolated doubles engine-portable.
    */
  def orderValueQuantiles(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderstatus"))
      .agg(expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").as("q"))
      .select(col("o_orderstatus"),
        Num.trunc4(element_at(col("q"), 1)).as("p25"),
        Num.trunc4(element_at(col("q"), 2)).as("p50"),
        Num.trunc4(element_at(col("q"), 3)).as("p75"))
      .orderBy(col("o_orderstatus"))

  /** Rollup: region -> nation hierarchy totals (grouping sets). */
  def customerRollup(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), sum(dec(col("c_acctbal"))).cast("double").as("total_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
}
