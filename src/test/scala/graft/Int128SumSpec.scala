package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ext.expr.Int128Sum

/** The 128-bit exact sum aggregate vs a BigInt reference — including the
  * paths a plain long sum can't survive: lo-word carries, negative
  * values, null skipping, empty groups.
  */
class Int128SumSpec extends SparkSpec {

  import spark.implicits._

  private def refSum(xs: Seq[Long], scale: Int): BigDecimal =
    BigDecimal(xs.map(BigInt(_)).sum) / BigDecimal(10).pow(scale)

  test("int128 sum matches BigInt reference on random signed longs") {
    val rnd = new scala.util.Random(421)
    val xs = Seq.fill(10000)(rnd.nextLong() / 1000) // keep |sum| well inside 128 bits
    val got = xs.toDF("x").agg(Int128Sum.sumLong(col("x"), 4)).head().getDecimal(0)
    assert(BigDecimal(got) == refSum(xs, 4))
  }

  test("int128 sum carries across the lo word (values a long sum overflows)") {
    val xs = Seq.fill(64)(Long.MaxValue - 7) // sum ~ 2^69: must carry into hi
    val got = xs.toDF("x").agg(Int128Sum.sumLong(col("x"), 0)).head().getDecimal(0)
    assert(BigDecimal(got) == refSum(xs, 0))
    val neg = Seq.fill(64)(Long.MinValue + 11) // and the negative direction
    val gotN = neg.toDF("x").agg(Int128Sum.sumLong(col("x"), 0)).head().getDecimal(0)
    assert(BigDecimal(gotN) == refSum(neg, 0))
  }

  test("int128 sum skips nulls; all-null and empty groups yield null") {
    val df = Seq[(String, Option[Long])](
      ("a", Some(5L)), ("a", None), ("a", Some(-2L)), ("b", None))
      .toDF("k", "x")
    val rows = df.groupBy("k").agg(Int128Sum.sumLong(col("x"), 2).as("s"))
      .orderBy("k").collect()
    assert(BigDecimal(rows(0).getDecimal(1)) == BigDecimal("0.03"))
    assert(rows(1).isNullAt(1))
    val empty = spark.emptyDataset[Long].toDF("x")
      .agg(Int128Sum.sumLong(col("x"), 2)).head()
    assert(empty.isNullAt(0))
  }

  test("int128 sum agrees with decimal sum per group on fixture money") {
    val orders = t("orders")
    val viaDec = orders.groupBy("o_orderstatus")
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("s"))
      .orderBy("o_orderstatus").collect().map(r => (r.getString(0), r.getDouble(1)))
    val via128 = orders.groupBy("o_orderstatus")
      .agg(Int128Sum.sumFixed(col("o_totalprice"), 2).cast("double").as("s"))
      .orderBy("o_orderstatus").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(viaDec.sameElements(via128))
  }

  test("int128 sum stays exact under codegen-only mode (no silent fallback)") {
    val conf = spark.conf
    val prevMode = conf.getOption("spark.sql.codegen.factoryMode")
    val prevFb = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      val xs = Seq(Long.MaxValue - 1, 5L, -17L, Long.MaxValue - 3)
      val got = xs.toDF("x").agg(Int128Sum.sumLong(col("x"), 2)).head().getDecimal(0)
      assert(BigDecimal(got) == refSum(xs, 2))
    } finally {
      prevMode.fold(conf.unset("spark.sql.codegen.factoryMode"))(v =>
        conf.set("spark.sql.codegen.factoryMode", v))
      prevFb.fold(conf.unset("spark.sql.codegen.fallback"))(v =>
        conf.set("spark.sql.codegen.fallback", v))
    }
  }
}
