package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Shuffle-shape helpers shared by the compute-dense reduce kernels. */
object Shuffles {

  /** USER-pinned WIDE clustering on `keys` for a COMPUTE-dense reduce
    * kernel (quadratic pair emission, per-group brute-force sweeps,
    * string-heavy builds) whose shuffled BYTES are tiny: AQE's
    * bytes-targeted partition coalescing would merge the exchange onto
    * one task and serialize the compute (measured: q_session_overlap
    * 3.1s coalesced vs 1.25s wide, e_knn_graph 1.2s vs 0.76s, sf0.1).
    * A user repartition on the same keys satisfies the downstream
    * aggregate/join's required distribution — no extra exchange — and
    * is exempt from coalescing. Width = max(cores, configured shuffle
    * partitions): on a real cluster that IS the planner's own width,
    * so only the small-volume degenerate coalesce is excluded.
    *
    * `spark.graft.pinWide=false` drops the pin (the kernel's own
    * exchange takes over, AQE coalescing included) — the escape hatch,
    * and the A/B lever tools/PinToggleProbe measures with.
    */
  def pinWide(df: DataFrame, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val on = spark.sessionState.conf
      .getConfString("spark.graft.pinWide", "true") == "true"
    if (!on) df
    else df.repartition(
      math.max(spark.sparkContext.defaultParallelism,
        spark.sessionState.conf.numShufflePartitions), keys: _*)
  }
}
