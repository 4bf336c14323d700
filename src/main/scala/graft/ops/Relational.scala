package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Relational ops (reference: simple_etl.py:313-351, SURVEY.md §2.2 T9).
  */
object Relational {

  val joinTypes: Set[String] = Set("inner", "left", "right", "outer")

  /** T9 — binary equi-join, explicit column-equality condition so BOTH
    * key columns survive in the output, exactly as the reference
    * documents for its own join (simple_etl.py:338-342).
    *
    * Scale notes: the condition form `l(lk) === r(rk)` is still an
    * equi-join to Catalyst, so it plans as broadcast-hash (small side)
    * or sort-merge (both large) — never nested-loop. Set
    * `broadcastRight = true` to force the hint for dimension tables the
    * planner's size estimate misses; AQE will also convert to broadcast
    * at runtime when the built side turns out small.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      how: String = "inner",
      broadcastRight: Boolean = false): DataFrame = {
    require(joinTypes(how), s"join type '$how' not in $joinTypes (simple_etl.py:324)")
    val r = if (broadcastRight) broadcast(right) else right
    left.join(r, left(leftKey) === r(rightKey), how)
  }

  /** Semi/anti joins — not in the reference UI (SURVEY.md §2.4) but
    * first-class in any engine run at scale (EXISTS / NOT EXISTS without
    * materializing the right side's columns).
    */
  def semiJoin(left: DataFrame, right: DataFrame, lk: String, rk: String): DataFrame =
    left.join(right, left(lk) === right(rk), "left_semi")

  def antiJoin(left: DataFrame, right: DataFrame, lk: String, rk: String): DataFrame =
    left.join(right, left(lk) === right(rk), "left_anti")

  /** Salted equi-join for skewed keys: the big (left) side is split into
    * `salts` random sub-keys, the small-but-too-big-to-broadcast (right)
    * side is replicated once per salt, so one hot key fans out across
    * `salts` reducers instead of melting a single one. Result set is
    * identical to [[join]]; use when AQE's skew-join split isn't enough
    * (e.g. a single key holding >1 executor's worth of rows).
    * Inner/left only: replicating the right side makes right/outer
    * null-matching semantics ambiguous.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      how: String = "inner",
      salts: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions.{array, explode, lit, rand}
    require(how == "inner" || how == "left",
      s"saltedJoin supports inner/left, got '$how'")
    val sl = left.withColumn("__salt", (rand(42) * salts).cast("int"))
    val sr = right.withColumn("__salt", explode(array((0 until salts).map(lit(_)): _*)))
    sl.join(sr, sl(leftKey) === sr(rightKey) && sl("__salt") === sr("__salt"), how)
      .drop("__salt")
  }
}
