package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampNTZType}

/** Temporal / event-stream ops over the `events` fixture
  * (FIXTURES.md: event_id, ts, user_id, event_type, value, props-JSON).
  * The reference has no temporal operators (SURVEY.md §2.4); these are
  * BASELINE north-star extensions. Batch forms here; streaming forms in
  * graft.streaming.StreamingOps share the same aggregation shape.
  *
  * Timestamp-determinism policy: fixture `ts` is parquet timestamp[ns];
  * Spark truncates to micros on read while DuckDB keeps ns, so oracle
  * queries never emit raw timestamps — window starts are emitted as
  * epoch SECONDS (bigint), which both engines agree on exactly.
  */
object Events {

  /** Normalize the fixture's `ts` to a session-TZ TIMESTAMP whatever
    * physical form the parquet carries:
    *  - TIMESTAMP(NANOS) read via `spark.sql.legacy.parquet.nanosAsLong
    *    =true` arrives as an ns-epoch long: convert ns -> us with
    *    integer division (floor — the same truncation DuckDB's
    *    epoch_us applies), then to a proper timestamp;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
    *    TIMESTAMP_NTZ (Spark 4 infers NTZ by default): cast to
    *    TIMESTAMP. Sessions here always run UTC, so the NTZ wall-clock
    *    re-interprets to the identical epoch-micros DuckDB reads —
    *    and downstream `unix_micros`/watermarks (TIMESTAMP-only) work.
    */
  def normalizeTs(events: DataFrame): DataFrame =
    events.schema("ts").dataType match {
      case LongType         => events.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => events.withColumn("ts", col("ts").cast("timestamp"))
      case _                => events
    }

  /** Tumbling-window aggregate (1 hour) per event type. Uses Spark's
    * `window()` — the same expression the streaming variant uses, so
    * batch and stream share one definition.
    */
  def hourlyByType(eventsRaw: DataFrame): DataFrame = {
    graft.ext.expr.Int128Sum.ensureRegistered(eventsRaw.sparkSession)
    val events = normalizeTs(eventsRaw)
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        // value is exact 2-dec; scaled-long int128 sum (see Aggregates)
        graft.ext.expr.Int128Sum.sumFixed(col("value"), 2).cast("double").as("total_value"))
      .select(
        unix_timestamp(col("w.start")).as("hour_epoch"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy(col("hour_epoch"), col("event_type"))
  }

  /** SLIDING hourly windows (30-minute slide): every event lands in two
    * overlapping windows — the moving-average / rolling-rate shape.
    * Still one partial-first aggregate: `window(ts, 1h, 30m)` expands
    * each row to its two windows BEFORE the shuffle, so the exchange
    * carries (window, type) partials exactly like the tumbling case,
    * just 2x of them.
    */
  def slidingHourlyByType(eventsRaw: DataFrame): DataFrame = {
    val events = normalizeTs(eventsRaw)
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("event_type"), col("n"))
      .orderBy(col("ws"), col("event_type"))
  }

  /** JSON extraction from the `props` column (`{"k": 87}`) — the
    * fixtures' motivation for from_json/get_json_object (SURVEY.md §1).
    * Uses from_json with an explicit ONE-FIELD schema: Jackson parses
    * straight into a single-int struct and skips unrequested fields,
    * where get_json_object re-walks the document per path expression;
    * with a declared schema the parse also stays a vectorizable
    * projection (no path-string interpretation per row).
    */
  def propsKStats(eventsRaw: DataFrame): DataFrame = {
    val events = eventsRaw
    events
      .withColumn("k",
        from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k", IntegerType))))
          .getField("k"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k").cast(LongType)).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        count(col("k")).as("n_k"))
      .orderBy(col("event_type"))
  }

  /** Sessionization by inactivity gap: a new session starts when the gap
    * to the user's previous event exceeds `gapMinutes`. One shuffle on
    * user_id; the lag/cumsum pattern is the standard distributed
    * sessionizer (vs. the streaming variant's mapGroupsWithState).
    * Gaps compare in microseconds (unix_micros) — exact integers.
    */
  def sessionCounts(eventsRaw: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val events = normalizeTs(eventsRaw)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMicros = gapMinutes.toLong * 60L * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapMicros, 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** As-of join over the event stream: for each click, the user's most
    * recent prior-or-simultaneous view (attribution-style "state at
    * event time" lookup). Built on [[graft.ops.Relational.asOfJoin]];
    * timestamps emitted as epoch micros (exact integers both engines
    * agree on).
    */
  def clickLastView(eventsRaw: DataFrame): DataFrame = {
    val events = normalizeTs(eventsRaw)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
    graft.ops.Relational.asOfJoin(clicks, views, Seq("user_id"), "ts", "view_ts", rightPrefix = "")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        unix_micros(col("view_ts")).as("view_us"),
        col("view_id"))
      .orderBy(col("event_id"))
  }

  /** Range-join over the event stream: purchases within 30 minutes
    * AFTER each click by the same user, counted per click (conversion-
    * window attribution). Left-semantics range join (zero-count clicks
    * kept as null-match rows; count(p_id) skips nulls → 0).
    */
  def clickPurchaseCounts(eventsRaw: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val events = normalizeTs(eventsRaw)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("event_id").as("p_id"))
    graft.ops.Relational.rangeJoin(
      clicks, purchases, Seq("user_id"), "ts", "pts",
      lowerUs = 0L, upperUs = windowMinutes.toLong * 60L * 1000000L, how = "left")
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(col("p_id")).as("n_purchases"))
      .orderBy(col("event_id"))
  }

  /** Daily view→purchase conversion funnel: of the users who viewed on
    * a day, how many purchased LATER that same day (strictly after their
    * first view — event-order-aware, not just co-occurrence). Two
    * partial-first aggregates + one equi-join on (day, user) + one final
    * aggregate; timestamps compare as exact epoch-microsecond integers,
    * the rate is one trunc4'd IEEE division.
    */
  def dailyConversion(eventsRaw: DataFrame): DataFrame = {
    val events = normalizeTs(eventsRaw)
    val v = events.filter(col("event_type") === "view")
      .groupBy(to_date(col("ts")).as("day"), col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("first_view_us"))
    val p = events.filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"), col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("last_purchase_us"))
    v.join(p, Seq("day", "user_id"), "left")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_view_users"),
        sum(when(col("last_purchase_us") > col("first_view_us"), 1L).otherwise(0L))
          .as("n_converted"))
      .withColumn("conv_rate", graft.ext.Num.trunc4(
        col("n_converted").cast("double") / col("n_view_users").cast("double")))
      .orderBy(col("day"))
  }

  /** Per-type daily counts — partition-prunable shape: if `events` were
    * written partitioned by date (Sinks.parquet(partitionBy=day)), this
    * query reads only matching partitions at 100 TB.
    */
  /** Day-over-day retention: of the users active on day d, how many
    * are active again on d+1. The classic engagement self-join: one
    * distinct (day, user) projection consumed twice, joined on
    * (user, day+1) — co-partitioned on user_id after the first
    * shuffle, so the second side reuses the exchange. Count-only
    * (no money), so there is no summation-order concern.
    */
  def dailyRetention(eventsRaw: DataFrame): DataFrame = {
    val events = normalizeTs(eventsRaw)
    val days = events.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val next = days.select(col("day").as("next_day"), col("user_id"))
    days.join(next,
        days("user_id") === next("user_id") &&
          next("next_day") === date_add(days("day"), 1), "left")
      .groupBy(days("day"))
      .agg(count(lit(1)).as("n_active"),
        count(col("next_day")).as("n_retained"))
      .orderBy(col("day"))
  }

  /** Rolling-window active users: DAU, trailing-7-day WAU, and the
    * DAU/WAU stickiness ratio per observed day — the standard
    * engagement health panel. Rolling DISTINCT doesn't compose as a
    * window aggregate, so the window is EXPANDED instead: each
    * (day, user) pair is fanned out to the 7 trailing-window days it
    * contributes to, then deduplicated — turning the rolling distinct
    * into a plain hash aggregate.
    *
    * Scale shape: the fan-out is map-side (explode of a 7-element
    * date sequence), the stream it feeds is the DISTINCT (day, user)
    * set (already collapsed from raw events by a partial-first
    * distinct), and everything downstream is hash-partitioned
    * aggregates — no window state, no sort. Fan-out factor equals the
    * window length, the price any exact rolling-distinct pays.
    */
  def rollingActiveUsers(eventsRaw: DataFrame): DataFrame = {
    import graft.ext.Num.trunc4
    val events = normalizeTs(eventsRaw)
    val du = events.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .localCheckpoint(false) // feeds dau, wau fan-out, and the day filter
    val days = du.select(col("day")).distinct()
    val wau = du
      .select(explode(sequence(col("day"), date_add(col("day"), 6))).as("day2"),
        col("user_id"))
      .distinct()
      .join(days.select(col("day").as("day2")), "day2")
      .groupBy(col("day2").as("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
    du.groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
      .join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        trunc4(col("dau").cast("double") / col("wau").cast("double")).as("stickiness4"))
      .orderBy(col("day"))
  }

  /** Per-user activity span profile: event count, first/last epoch
    * second, inclusive span in days, and events-per-active-day rate —
    * the user-lifetime panel feeding churn features and bot screens
    * (thousands of events over a one-day span is automation).
    * One partial-first aggregate keyed by user; min/max/count all
    * combine associatively, so the pass is a single shuffle of partial
    * tuples regardless of event volume.
    */
  def userActivitySpan(eventsRaw: DataFrame): DataFrame = {
    import graft.ext.Num.trunc4
    val e = normalizeTs(eventsRaw)
    e.select(col("user_id"), expr("unix_micros(ts) div 1000000").as("s"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("s")).as("first_s"), max(col("s")).as("last_s"))
      .withColumn("span_days",
        expr("(last_s div 86400) - (first_s div 86400) + 1"))
      .withColumn("rate4",
        trunc4(col("n_events").cast("double") / col("span_days").cast("double")))
      .orderBy(col("user_id"))
  }

  def dailyFunnel(eventsRaw: DataFrame): DataFrame = {
    val events = normalizeTs(eventsRaw)
    events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("day"), col("event_type"))
  }

  private def dayNumCol: org.apache.spark.sql.Column =
    datediff(to_date(col("ts")), lit(java.sql.Date.valueOf("1970-01-01"))).cast("bigint")

  /** Time-series gap filling with forward fill (last observation carried
    * forward): per tracked user, daily purchase totals over the corpus'
    * FULL day range — days without a purchase get the user's most recent
    * prior total (-1 before any observation). The feature-engineering
    * shape for sparse per-entity signals joined against dense grids.
    *
    * Scale shape: the grid is keys x sequence(min_day, max_day)
    * exploded MAP-SIDE off a 1-row broadcast bounds aggregate (never a
    * row-proportional driver collect); the fill is one window over the
    * grid, partitioned by key — a single shuffle on user_id. Grid rows =
    * |keys| x |days|, independent of event count.
    */
  def gapFillDailyPurchases(eventsRaw: DataFrame, maxUser: Int = 10): DataFrame = {
    graft.ext.expr.Int128Sum.ensureRegistered(eventsRaw.sparkSession)
    val events = normalizeTs(eventsRaw)
    val obs = events.filter(col("event_type") === "purchase" &&
      col("user_id").between(1, maxUser))
    val daily = obs.groupBy(col("user_id"), dayNumCol.as("day_num"))
      .agg(graft.ext.expr.Int128Sum.sumFixed(col("value"), 2).cast("double").as("day_value"))
    val bounds = events.agg(min(dayNumCol).as("mn"), max(dayNumCol).as("mx"))
    val grid = daily.select(col("user_id")).distinct()
      .crossJoin(broadcast(bounds)) // 1-row bounds: map-side day expansion
      .select(col("user_id"), explode(sequence(col("mn"), col("mx"))).as("day_num"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day_num"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day_num"), "left")
      .select(col("user_id"), col("day_num"),
        coalesce(col("day_value"), lit(-1.0)).as("day_value"),
        coalesce(last(col("day_value"), ignoreNulls = true).over(w), lit(-1.0))
          .as("filled_value"))
      .orderBy(col("user_id"), col("day_num"))
  }

  /** Daily per-type anomaly flags via EXACT moments: day totals are
    * exact fixed-point sums ([[graft.ext.expr.Int128Sum]]), and the
    * per-type mean/variance come from exact integer/decimal first and
    * second moments (n, Σd, Σd²) — so unlike a naive stddev_samp over
    * doubles, the result is independent of partial-aggregation order:
    * z-scores on both engines derive from IDENTICAL exact inputs and an
    * identical IEEE expression tree, which is what lets an
    * anomaly-detection query be hash-gated at all. Population variance
    * var = (n·Σd² − (Σd)²)/n²; z truncated to 4 decimals; σ=0 → z=0.
    */
  def dailyAnomalies(eventsRaw: DataFrame, sigma: Double = 2.0): DataFrame = {
    graft.ext.expr.Int128Sum.ensureRegistered(eventsRaw.sparkSession)
    val events = normalizeTs(eventsRaw)
    val daily = events.groupBy(col("event_type"), dayNumCol.as("day_num"))
      .agg(graft.ext.expr.Int128Sum.sumFixed(col("value"), 2).as("d"))
    val stats = daily.groupBy(col("event_type")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("d")).cast("double").as("s1"),
      sum(col("d") * col("d")).cast("double").as("s2"))
    val sd = sqrt((col("n") * col("s2") - col("s1") * col("s1")) / (col("n") * col("n")))
    val z = when(sd === 0.0, lit(0.0))
      .otherwise((col("d").cast("double") - col("s1") / col("n")) / sd)
    daily.join(stats, "event_type")
      .select(col("event_type"), col("day_num"),
        col("d").cast("double").as("day_value"),
        graft.ext.Num.trunc4(z).as("z"),
        (abs(z) > sigma).as("is_anomaly"))
      .orderBy(col("event_type"), col("day_num"))
  }

  /** Deterministic A/B split + 2x2 conversion chi-square: users are
    * assigned to variants by the same Knuth multiplicative-hash
    * high-bits bucket as [[graft.ext.Curation.splitAssign]] (stable
    * under appends/repartitioning, no RNG), conversion is "has at
    * least one purchase event", and the output is ONE row with the
    * contingency counts, per-variant rates, relative lift, and the
    * chi-square statistic (1 dof). All counts are exact integers; the
    * statistic is one fixed IEEE expression tree over them, mirrored
    * operation-for-operation in the oracle. Shape: one per-user
    * aggregate (map-side bucket assignment), one 2-row aggregate, one
    * conditional flatten — nothing post-shuffle exceeds 2 rows.
    */
  def abTestConversion(eventsRaw: DataFrame): DataFrame = {
    import graft.ext.Num.trunc4
    val events = normalizeTs(eventsRaw)
    val perUser = events.groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"))
    val bucket = shiftright(
      pmod(pmod(col("user_id"), lit(2147483648L)) * lit(2654435761L), lit(4294967296L)) *
        lit(2L), 32)
    val flat = perUser
      .withColumn("variant", when(bucket === 0L, "A").otherwise("B"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).cast("long").as("conv"))
      .agg(
        sum(when(col("variant") === "A", col("n"))).cast("long").as("users_a"),
        sum(when(col("variant") === "A", col("conv"))).cast("long").as("conv_a"),
        sum(when(col("variant") === "B", col("n"))).cast("long").as("users_b"),
        sum(when(col("variant") === "B", col("conv"))).cast("long").as("conv_b"))
    val a = col("conv_a").cast("double")
    val b = (col("users_a") - col("conv_a")).cast("double")
    val c = col("conv_b").cast("double")
    val d = (col("users_b") - col("conv_b")).cast("double")
    val n = (col("users_a") + col("users_b")).cast("double")
    val det = a * d - b * c
    val chi2 = (n * (det * det)) / (((a + b) * (c + d)) * ((a + c) * (b + d)))
    flat.select(col("users_a"), col("conv_a"), col("users_b"), col("conv_b"),
      trunc4(a / col("users_a").cast("double")).as("rate_a4"),
      trunc4(c / col("users_b").cast("double")).as("rate_b4"),
      trunc4((c / col("users_b").cast("double")) /
        (a / col("users_a").cast("double")) - 1.0).as("lift4"),
      trunc4(chi2).as("chi2_4"))
  }

  /** Time-to-convert histogram: minutes from a user's FIRST view to
    * each subsequent purchase, bucketed in 30-minute bins up to 24h —
    * the latency distribution behind attribution-window choices. All
    * arithmetic is exact integer microseconds (bucket = floor division
    * via subtract-mod, cross-engine exact); the per-user first-view
    * aggregate and the purchase join co-partition on user_id.
    */
  def conversionLagHistogram(eventsRaw: DataFrame): DataFrame = {
    val events = normalizeTs(eventsRaw)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val firstView = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("fv"))
    val binUs = 30L * 60 * 1000000 // 30 minutes in micros
    val delay = col("us") - col("fv")
    val bucket = ((delay - pmod(delay, lit(binUs))) / lit(binUs)).cast("long")
    events.filter(col("event_type") === "purchase")
      .join(firstView, "user_id")
      .filter(delay > 0 && delay <= lit(24L * 3600 * 1000000))
      .select(bucket.as("bucket_30m"))
      .groupBy(col("bucket_30m")).agg(count(lit(1)).as("n_purchases"))
      .orderBy(col("bucket_30m"))
  }

  /** Day-of-week profile, the weekly-seasonality companion to
    * [[hourOfDayProfile]]. The weekday comes from epoch-day arithmetic
    * — `(days_since_epoch + 4) mod 7`, 0 = Sunday — because the
    * engines' dayofweek() builtins disagree on numbering (Spark
    * 1=Sunday, DuckDB 0=Sunday); integer arithmetic over the same
    * day number can't diverge.
    */
  def dayOfWeekProfile(eventsRaw: DataFrame): DataFrame = {
    graft.ext.expr.Int128Sum.ensureRegistered(eventsRaw.sparkSession)
    val events = normalizeTs(eventsRaw)
    val dow = pmod(datediff(to_date(col("ts")), lit("1970-01-01").cast("date")) + 4, lit(7))
    events
      .groupBy(col("event_type"), dow.cast("bigint").as("dow"))
      .agg(count(lit(1)).as("n"),
        graft.ext.expr.Int128Sum.sumFixed(col("value"), 2).cast("double").as("total_value"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** Hour-of-day seasonality profile: event volume and exact money
    * totals by (type, hour 0-23) — the diurnal-pattern report behind
    * capacity planning and anomaly baselines. Pure partial-first
    * aggregate over at most |types| x 24 groups; the shuffle carries
    * group partials only.
    */
  def hourOfDayProfile(eventsRaw: DataFrame): DataFrame = {
    graft.ext.expr.Int128Sum.ensureRegistered(eventsRaw.sparkSession)
    val events = normalizeTs(eventsRaw)
    events
      .groupBy(col("event_type"), hour(col("ts")).cast("bigint").as("hour_of_day"))
      .agg(count(lit(1)).as("n"),
        graft.ext.expr.Int128Sum.sumFixed(col("value"), 2).cast("double").as("total_value"))
      .orderBy(col("event_type"), col("hour_of_day"))
  }

  /** Strict-order three-step funnel per day: users whose first view is
    * followed by a click strictly after it, then a purchase strictly
    * after that click — ORDERED sequencing, which [[dailyConversion]]'s
    * min/max comparison cannot express. Each stage is an aggregate
    * joined to the previous stage's first-qualifying timestamp; all
    * joins are co-partitioned on (day, user) after the first shuffle.
    */
  def orderedFunnel(eventsRaw: DataFrame): DataFrame = {
    val events = normalizeTs(eventsRaw)
      .select(to_date(col("ts")).as("day"), col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
    val v = events.filter(col("event_type") === "view")
      .groupBy(col("day"), col("user_id")).agg(min(col("us")).as("fv"))
    val c = events.filter(col("event_type") === "click")
      .join(v, Seq("day", "user_id"))
      .filter(col("us") > col("fv"))
      .groupBy(col("day"), col("user_id")).agg(min(col("us")).as("fc"))
    val p = events.filter(col("event_type") === "purchase")
      .join(c, Seq("day", "user_id"))
      .filter(col("us") > col("fc"))
      .select(col("day"), col("user_id")).distinct()
    v.join(c, Seq("day", "user_id"), "left")
      .join(p.withColumn("hit", lit(1)), Seq("day", "user_id"), "left")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_view_users"),
        count(col("fc")).as("n_seq_click"),
        count(col("hit")).as("n_seq_purchase"))
      .orderBy(col("day"))
  }

  /** First-order Markov transition counts between consecutive events of
    * the same user: the behavioral sequence-mining pass behind "what do
    * users do after X" product questions. One lag() window per user
    * (shuffle on user_id, sort within user — never a global sort), then
    * a partial-first count per (prev, next) pair. `share` normalizes
    * each row against its prev-type total via a window over the
    * already-tiny |types|^2 grouped result. Ties in ts break on
    * event_id so the sequence — and therefore the counts — are
    * deterministic under any partitioning.
    */
  def transitionMatrix(eventsRaw: DataFrame): DataFrame = {
    val events = normalizeTs(eventsRaw)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val wPrev = Window.partitionBy(col("prev_type"))
    pairs
      .select(col("prev_type"), col("next_type"), col("n"),
        graft.ext.Num.trunc4(col("n").cast("double") /
          sum(col("n")).over(wPrev).cast("double")).as("share"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** Top-k three-step behavioral paths: the [[transitionMatrix]] idea
    * extended to (prev2, prev1, current) triples — "what sequences
    * lead to a purchase". Two lag() taps over ONE window pass (same
    * shuffle/sort as a single lag — Spark evaluates both from the one
    * sorted partition), partial-first count per triple, top-k via
    * orderBy+limit = TakeOrderedAndProject (never a global sort).
    * Count ties break on the path columns so top-k is deterministic.
    */
  def topPaths(eventsRaw: DataFrame, k: Int = 20): DataFrame = {
    val events = normalizeTs(eventsRaw)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("event_type").as("step3"),
        lag(col("event_type"), 1).over(w).as("step2"),
        lag(col("event_type"), 2).over(w).as("step1"))
      .filter(col("step1").isNotNull)
      .groupBy(col("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(k)
  }

  /** Association-rule metrics over the co-occurrence pairs: support,
    * confidence, and lift per event-type pair, with the user as the
    * basket. Every metric is ONE correctly-rounded IEEE division (or a
    * division of two exact integer products — nAB*nU and nA*nB stay
    * under 2^63 up to ~1e9 users), so both engines compute
    * bit-identical values: no summation noise anywhere. The per-type
    * and total counts are tiny aggregates broadcast back onto the
    * pair table.
    */
  def basketAffinity(eventsRaw: DataFrame): DataFrame = {
    import graft.ext.Num.trunc4
    val d = normalizeTs(eventsRaw).select(col("user_id"), col("event_type")).distinct()
    val nU = d.agg(count_distinct(col("user_id")).as("n_total"))
    val perType = d.groupBy(col("event_type")).agg(count(lit(1)).as("n_type"))
    val a = d.select(col("user_id"), col("event_type").as("type_a"))
    val b = d.select(col("user_id"), col("event_type").as("type_b"))
    val pairs = a.join(b, Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_users"))
    pairs
      .crossJoin(broadcast(nU))
      .join(broadcast(perType.select(col("event_type").as("type_a"), col("n_type").as("na"))), "type_a")
      .join(broadcast(perType.select(col("event_type").as("type_b"), col("n_type").as("nb"))), "type_b")
      .select(col("type_a"), col("type_b"), col("n_users"),
        trunc4(col("n_users").cast("double") / col("n_total").cast("double")).as("support"),
        trunc4(col("n_users").cast("double") / col("na").cast("double")).as("conf_a_to_b"),
        trunc4((col("n_users") * col("n_total")).cast("double") /
          (col("na") * col("nb")).cast("double")).as("lift"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Event-type co-occurrence: for every unordered pair of event types,
    * how many users performed both — the support counts of basket/
    * association analysis, with the user as the basket. DISTINCT first
    * (one row per (user, type) — bounded by |types| per user), then a
    * self-equi-join on user_id with `a < b` to emit each pair once.
    * Both sides shuffle-partition on user_id, so the join is
    * co-partitioned after one exchange; per-user join fan-out is at
    * most |types|^2, a constant.
    */
  def eventCooccurrence(eventsRaw: DataFrame): DataFrame = {
    val d = normalizeTs(eventsRaw).select(col("user_id"), col("event_type")).distinct()
    val a = d.select(col("user_id"), col("event_type").as("type_a"))
    val b = d.select(col("user_id"), col("event_type").as("type_b"))
    a.join(b, Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Last-touch revenue attribution: each purchase's value is credited
    * to the campaign channel (props.k mod 10) of the user's most recent
    * click at or before the purchase; purchases with no prior click go
    * to channel -1 ("organic"). One shuffle on user_id; the ignore-
    * nulls `last()` window propagates the latest click's k down the
    * user's ordered stream — the standard distributed forward-fill, no
    * self-join, no per-user collect. Ordering ties break on event_id at
    * microsecond resolution (both engines compare the same truncated
    * epoch). Money sums stay exact cent longs.
    */
  def lastTouchAttribution(eventsRaw: DataFrame): DataFrame = {
    val events = normalizeTs(eventsRaw)
    val k = from_json(col("props"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", IntegerType))))
      .getField("k").cast(LongType)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events
      .withColumn("click_k", when(col("event_type") === "click", k))
      .withColumn("attr_k", last(col("click_k"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(pmod(col("attr_k"), lit(10L)), lit(-1L)).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(round(col("value") * 100).cast("long")).cast("long").as("cents"))
      .select(col("channel"), col("n_purchases"),
        (col("cents").cast("double") / 100.0).as("revenue"))
      .orderBy(col("channel"))
  }

  /** Cumulative lifetime value per signup cohort: users are cohorted by
    * the month of their FIRST event; purchase revenue is accumulated by
    * months-since-signup and divided by cohort size — the LTV curve
    * marketing reads payback periods off, and the cohort-quality
    * comparison (are newer cohorts monetizing faster?) that a plain
    * revenue timeseries can't answer. Revenue stays exact integer cents
    * through the cumulative window; the single per-row divide by cohort
    * size is engine-neutral. Scale shape: one per-user reduce for
    * cohorts, one (cohort, age) partial-first aggregate, and a window
    * over the tiny cohort x age frame, partitioned per cohort.
    */
  def cohortLtv(eventsRaw: DataFrame): DataFrame = {
    import graft.ext.Num.trunc4
    val e = normalizeTs(eventsRaw)
    val firstMonth = e.groupBy(col("user_id"))
      .agg(min(date_trunc("month", col("ts"))).as("cohort_ts"))
      .select(col("user_id"), to_date(col("cohort_ts")).as("cohort"))
    val cohortSizes = firstMonth.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_users"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(date_trunc("month", col("ts"))).as("month"),
        round(col("value") * 100d).cast("long").as("cents"))
    val byAge = purchases.join(firstMonth, "user_id")
      .select(col("cohort"),
        (months_between(col("month"), col("cohort"))).cast("long").as("age_months"),
        col("cents"))
      .groupBy(col("cohort"), col("age_months"))
      .agg(sum(col("cents")).cast("long").as("rev_cents"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("age_months"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byAge
      .withColumn("cum_cents", sum(col("rev_cents")).over(w).cast("long"))
      .join(cohortSizes, "cohort")
      .select(col("cohort"), col("age_months"), col("n_users"),
        (col("cum_cents").cast("double") / 100.0).as("cum_revenue"),
        trunc4(col("cum_cents").cast("double") / col("n_users").cast("double") / 100.0)
          .as("ltv_per_user4"))
      .orderBy(col("cohort"), col("age_months"))
  }

  /** Peak session concurrency per day — the capacity-planning number
    * (how many sessions were EVER simultaneously open?) that daily
    * session COUNTS can't give: 1000 sequential sessions and 1000
    * overlapping ones count the same but load very differently.
    * Sessions are the same gap-based islands as [[sessionCounts]]
    * (gap > `gapMinutes` starts a new one); each becomes a +1 at its
    * start and a -1 after its end, and the peak is the max of the
    * running sum. A session is attributed to its START day (the
    * overnight spill-over is negligible at a 30-min gap and keeps the
    * sweep per-day partitioned). Tie rule: at equal timestamps starts
    * sort before ends, so back-to-back touching sessions count as
    * concurrent — deterministic in both engines.
    *
    * Scale shape: the session build is per-user window state; the
    * sweep window is PARTITIONED BY day — per-partition state only,
    * no global sort anywhere. All counts exact integers.
    */
  def peakConcurrency(eventsRaw: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val events = normalizeTs(eventsRaw)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMicros = gapMinutes.toLong * 60L * 1000000L
    val sessions = events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"))
    val points = sessions
      .select(expr("start_us div 86400000000").as("day_num"),
        col("start_us").as("us"), lit(1L).as("delta"))
      .union(sessions.select(expr("start_us div 86400000000").as("day_num"),
        col("end_us").as("us"), lit(-1L).as("delta")))
    val sweep = Window.partitionBy(col("day_num"))
      .orderBy(col("us"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    points
      .withColumn("open", sum(col("delta")).over(sweep))
      .groupBy(col("day_num"))
      .agg(max(col("open")).cast("long").as("peak_concurrent"),
        (count(lit(1)) / 2).cast("long").as("n_sessions"))
      .select(to_date(from_unixtime(col("day_num") * 86400L)).as("day"),
        col("n_sessions"), col("peak_concurrent"))
      .orderBy(col("day"))
  }

  /** Kaplan–Meier survival curve over user lifetimes: S(t) = prod over
    * observed churn times t_i <= t of (1 - d_i / n_i), the standard
    * right-censored estimator. Lifetime = days between a user's first
    * and last event; users still active in the final `censorDays` of
    * the observation window are CENSORED (they leave the risk set at
    * their lifetime without counting as churn) — dropping them instead
    * would bias churn high exactly for the newest cohorts.
    *
    * Determinism: the product is carried as a cumulative INTEGER sum of
    * 1e-8-scaled log factors (floor(ln((n-d)/n) * 1e8) as BIGINT — the
    * same exact-integer-sum convention as the OLS/Zipf fits), so both
    * engines exponentiate bit-identical inputs; d = n only at the
    * largest lifetime, where survival is pinned to exactly 0 instead
    * of ln(0). Scale shape: the per-user reduce is partial-first over
    * the fact stream; the two windows run over the DISTINCT-LIFETIME
    * frame (bounded by the observation span in days), not over users.
    */
  def kaplanMeier(eventsRaw: DataFrame, censorDays: Int = 14): DataFrame = {
    import graft.ext.Num.trunc4
    val e = normalizeTs(eventsRaw)
    val days = e.select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
    val maxDay = days.agg(max(col("day")).as("max_day"))
    val users = days.groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"), max(col("day")).as("last_day"))
      .crossJoin(broadcast(maxDay))
      .select((col("last_day") - col("first_day")).as("t"),
        when(col("last_day") <= col("max_day") - censorDays, 1L).otherwise(0L).as("ev"))
    val byT = users.groupBy(col("t"))
      .agg(count(lit(1)).as("obs"), sum(col("ev")).cast("long").as("d"))
    val wSuffix = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wPrefix = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_risk", sum(col("obs")).over(wSuffix).cast("long"))
      .withColumn("lf8", when(col("d") < col("n_risk"),
          floor(log((col("n_risk") - col("d")).cast("double") /
            col("n_risk").cast("double")) * lit(1.0e8)).cast("long"))
        .otherwise(lit(0L)))
      .withColumn("cum8", sum(col("lf8")).over(wPrefix).cast("long"))
      .select(col("t"), col("n_risk"), col("d").as("d_churn"),
        (col("obs") - col("d")).cast("long").as("n_censored"),
        when(col("d") === col("n_risk"), lit(0.0))
          .otherwise(trunc4(exp(col("cum8").cast("double") / lit(1.0e8)))).as("surv4"))
      .orderBy(col("t"))
  }

  /** Cross-user session-overlap pairs: the top-k pairs of sessions from
    * DIFFERENT users with the longest wall-clock overlap — the
    * "who is online together" read behind co-presence and
    * shared-device/fraud analysis. Sessions come from the same
    * 30-minute-gap construction as [[peakConcurrency]]; the pairing
    * runs through [[graft.ops.Relational.intervalJoin]]'s bin
    * decomposition (hour bins), NOT a quadratic theta-join — at scale
    * the shuffle is (sessions × bins-covered), and only bin-cohabiting
    * sessions ever meet. Overlap lengths are exact microsecond
    * integers; ties break on the full pair id.
    */
  def sessionOverlapPairs(
      eventsRaw: DataFrame,
      gapMinutes: Int = 30,
      k: Int = 20): DataFrame = {
    val events = normalizeTs(eventsRaw)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMicros = gapMinutes.toLong * 60L * 1000000L
    val sessions = events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"))
    val a = sessions.select(col("user_id").as("ua"), col("session_id").as("sa"),
      col("start_us").as("a_start"), col("end_us").as("a_end"))
    val b = sessions.select(col("user_id").as("ub"), col("session_id").as("sb"),
      col("start_us").as("b_start"), col("end_us").as("b_end"))
    graft.ops.Relational.intervalJoin(
        a, b, "a_start", "a_end", "b_start", "b_end", binUs = 3600L * 1000000L)
      .filter(col("ua") < col("ub"))
      .select(col("ua"), col("sa"), col("ub"), col("sb"),
        (least(col("a_end"), col("b_end")) -
          greatest(col("a_start"), col("b_start"))).as("overlap_us"))
      .orderBy(col("overlap_us").desc, col("ua"), col("sa"), col("ub"), col("sb"))
      .limit(k)
  }

  /** Rolling 7-day return rate: for every active day d, the share of
    * that day's active users who come back within the next 7 days —
    * the day-grain retention pulse (cohort triangles answer "which
    * month", this answers "is stickiness moving this week").
    *
    * Scale shape: the fact stream collapses once to the DISTINCT
    * (user, day) frame; the return test is a self-join on user_id with
    * a bounded day-range predicate (each user's day list is
    * calendar-bounded), then two partial-first counts per day. All
    * integers until the final ratio (trunc4).
    */
  def returnRate7d(eventsRaw: DataFrame, horizonDays: Int = 7): DataFrame = {
    import graft.ext.Num.trunc4
    val events = normalizeTs(eventsRaw)
    val days = events
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("d"))
      .distinct()
    val later = days.select(col("user_id"), col("d").as("d2"))
    val returned = days.join(later,
        Seq("user_id"))
      .filter(col("d2") > col("d") && col("d2") <= col("d") + horizonDays)
      .select(col("user_id"), col("d")).distinct()
      .groupBy(col("d")).agg(count(lit(1)).cast("long").as("n_returned"))
    days.groupBy(col("d")).agg(count(lit(1)).cast("long").as("n_active"))
      .join(returned, Seq("d"), "left")
      .select(col("d").as("day_num"), col("n_active"),
        coalesce(col("n_returned"), lit(0L)).cast("long").as("n_returned"),
        trunc4(coalesce(col("n_returned"), lit(0L)).cast("double") /
          col("n_active").cast("double")).as("return_rate4"))
      .orderBy(col("day_num"))
  }

  /** Gaps-and-islands over per-user daily activity: contiguous runs of
    * active DAYS found with the classic `day_number - row_number`
    * grouping key (constant within a consecutive run, distinct across
    * gaps — no self-join, no recursion). Emits per user the total
    * active days, island count, and longest streak: the
    * retention/engagement shape every activity warehouse maintains.
    *
    * Scale shape: one distinct (user, day) projection (partial-first),
    * a window ordered within each user's DAYS (bounded by the
    * calendar, thousands of rows per user at most, never events), and
    * two tiny reaggregations. All integer arithmetic — bit-stable on
    * any engine.
    */
  def activityIslands(eventsRaw: DataFrame): DataFrame = {
    val events = normalizeTs(eventsRaw)
    val days = events
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val runs = days
      .withColumn("grp",
        datediff(col("d"), lit("1970-01-01")).cast("long") -
          row_number().over(byUser).cast("long"))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).cast("long").as("len"))
    runs.groupBy(col("user_id"))
      .agg(sum(col("len")).cast("long").as("n_days"),
        count(lit(1)).cast("long").as("n_islands"),
        max(col("len")).cast("long").as("longest_run"))
      .orderBy(col("user_id"))
  }
}
