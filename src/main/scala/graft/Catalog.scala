package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Named-table catalog — the Spark-native analogue of the reference's
  * `st.session_state.data_store` dict of pandas frames
  * (reference: simple_etl.py:21-25,32-45).
  *
  * Key design departure (SURVEY.md §1): the reference materializes every
  * table eagerly (pandas at rest); we bind names to **lazy** `DataFrame`
  * plans so Catalyst fuses whole pipelines (pushdown, pruning, codegen
  * across all composed operators). `checkpoint(name)` is the lazy
  * analogue of the reference's materialize-to-store step — only worth it
  * when a table is consumed more than once (e.g. both sides of a
  * self-join).
  */
final class Catalog(val spark: SparkSession) {
  private val store = mutable.LinkedHashMap.empty[String, DataFrame]

  /** Bind `name` to a (lazy) plan; also registers a temp view so the
    * table is reachable from `spark.sql`. Copy-on-write semantics, same
    * as the reference (a join writes a NEW table, simple_etl.py:344-348).
    */
  def register(name: String, df: DataFrame): DataFrame = {
    store(name) = df
    df.createOrReplaceTempView(name)
    df
  }

  def apply(name: String): DataFrame =
    store.getOrElse(name, sys.error(s"catalog: no table named '$name'"))

  def get(name: String): Option[DataFrame] = store.get(name)
  def names: Seq[String] = store.keys.toSeq
  def contains(name: String): Boolean = store.contains(name)

  def drop(name: String): Unit = {
    store.remove(name)
    spark.catalog.dropTempView(name)
  }

  /** Cache a hot table (referenced >= 2x downstream). */
  def checkpoint(name: String): DataFrame = {
    val df = apply(name).cache()
    store(name) = df
    df
  }

  /** Load all standard fixture tables from a scale-factor directory. */
  def loadFixtures(dir: String): Unit =
    Tables.all.foreach(t => register(t, Tables.read(spark, dir, t)))
}

/** Fixture-table reader helpers (TESTDATA.md / FIXTURES.md §2). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark refuses
    // without this (runtime-settable) legacy conf. Graft-owned sessions
    // set it at build time; set it here too so queries work on
    // externally-owned sessions (e.g. the round driver's).
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
