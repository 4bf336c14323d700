package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (the Deequ/dbt-tests shape): a rule
  * set is validated in ONE aggregate pass over the data — every
  * row-level rule becomes a conditional sum in the same partial-first
  * aggregation, so checking 20 rules costs one scan, not 20. Key
  * uniqueness (not expressible as a row predicate) runs as its own
  * count-distinct aggregate per key set.
  *
  * Output: one row per rule — (rule, n_rows, n_violations, pass) — the
  * table a pipeline gates promotion on ("fail the load if any pass=0").
  *
  * Scale: row rules are map-side conditional sums (shuffle = one
  * partial row per partition); uniqueness is a count-distinct whose
  * shuffle carries the key columns only. Nothing row-proportional
  * reaches the driver.
  */
object Quality {

  /** A named row-level rule: `violation` is the predicate that marks a
    * row BAD (null-safe by construction of the helpers below).
    */
  final case class Rule(name: String, violation: Column)

  def notNull(c: String): Rule = Rule(s"not_null_$c", col(c).isNull)

  /** Closed-interval range check; a null value counts as a violation
    * (a row that can't prove it's in range isn't in range).
    */
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"range_$c", col(c).isNull || col(c) < lo || col(c) > hi)

  /** Membership check against an allowed value set; nulls violate. */
  def inSet(c: String, allowed: Seq[String]): Rule =
    Rule(s"in_set_$c", col(c).isNull || !col(c).isin(allowed: _*))

  /** Run all rules; `uniqueKeys` adds one uniqueness check per key set
    * (n_violations = n_rows - n_distinct). Note Spark's countDistinct
    * skips rows where any key column is null — declare notNull rules on
    * the key columns alongside if nulls are possible.
    */
  def check(
      df: DataFrame,
      rules: Seq[Rule],
      uniqueKeys: Seq[Seq[String]] = Nil): DataFrame = {
    require(rules.nonEmpty || uniqueKeys.nonEmpty, "no rules given")
    // rule names become aggregate aliases: duplicates (two inRange rules
    // on one column) or the reserved n_rows would silently collide and
    // fail later with an ambiguous-reference error — fail clearly here
    val names = rules.map(_.name)
    require(names.distinct.length == names.length,
      s"duplicate rule names: ${names.diff(names.distinct).distinct.mkString(", ")} " +
        "(give explicit names via Rule(name, violation))")
    require(!names.contains("n_rows"), "'n_rows' is a reserved rule name")
    val parts: Seq[DataFrame] =
      (if (rules.isEmpty) Nil
       else {
         // coalesce: sum() over ZERO rows is null — an empty load must
         // report 0 violations / pass=1, not a null that neither passes
         // nor fails a promotion gate
         val aggs = count(lit(1)).cast("bigint").as("n_rows") +:
           rules.map(r =>
             coalesce(sum(when(r.violation, 1L).otherwise(0L)), lit(0L)).as(r.name))
         val one = df.agg(aggs.head, aggs.tail: _*)
         Seq(one.select(col("n_rows"),
             explode(array(rules.map(r =>
               struct(lit(r.name).as("rule"), col(r.name).as("n_violations"))): _*)).as("x"))
           .select(col("x.rule").as("rule"), col("n_rows"), col("x.n_violations").as("n_violations")))
       }) ++
      uniqueKeys.map { ks =>
        df.agg(count(lit(1)).cast("bigint").as("n_rows"),
            (count(lit(1)) - countDistinct(col(ks.head), ks.tail.map(col): _*))
              .cast("bigint").as("n_violations"))
          .select(lit(s"unique_${ks.mkString("_")}").as("rule"),
            col("n_rows"), col("n_violations"))
      }
    parts.reduce(_ unionByName _)
      .withColumn("pass", (col("n_violations") === 0L).cast("int"))
      .orderBy(col("rule"))
  }

  /** Order-independent table content digest: per row, the first 60 bits
    * of md5 over a caller-built canonical string; rows combine with
    * bit_xor — associative, commutative, overflow-free, so the digest
    * is identical at any partitioning/row order and XOR-merges across
    * shards (digest(a union b) = digest(a) XOR digest(b) for disjoint
    * parts). The migration-validation primitive: checksum source and
    * target, compare two longs instead of re-reading either table.
    * One map-side pass + a single-row aggregate; nothing but (n, 60-bit
    * word) crosses the wire.
    *
    * Caveat (inherent to XOR): a row appearing an EVEN number of times
    * cancels out; pair the digest with n_rows (returned here) or make
    * the canonical string unique per row (include the key).
    *
    * The canonical string must avoid engine-divergent formatting:
    * integers and strings render identically everywhere, but raw
    * doubles do NOT (shortest-round-trip vs Java Double.toString) —
    * money goes in as round(x*100) cents, timestamps as epoch seconds.
    */
  def contentChecksum(df: DataFrame, canonical: Column): DataFrame =
    df.select(
      conv(substring(md5(canonical), 1, 15), 16, 10).cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("digest"))

  /** Keyed row-level diff between two versions of a table: counts of
    * added / removed / changed / same rows, where "changed" compares an
    * md5 over the caller's canonical columns (same formatting rules as
    * [[contentChecksum]]). One full-outer shuffle join on the key
    * carrying (key, 16-byte digest) only — never row payloads — then a
    * 4-group aggregate: the CDC-validation / migration-drilldown step
    * after a [[contentChecksum]] mismatch says "something differs".
    */
  def tableDiff(
      oldVersion: DataFrame,
      newVersion: DataFrame,
      keyCol: String,
      canonical: Column): DataFrame = {
    def dig(df: DataFrame, dName: String) =
      df.select(col(keyCol).as("k"), md5(canonical).as(dName))
    dig(oldVersion, "d_old").join(dig(newVersion, "d_new"), Seq("k"), "full_outer")
      .select(
        when(col("d_old").isNull, "added")
          .when(col("d_new").isNull, "removed")
          .when(col("d_old") === col("d_new"), "same")
          .otherwise("changed").as("status"))
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .orderBy(col("status"))
  }

  /** Referential-integrity audit across a set of declared FK edges:
    * one row per (child.fk -> parent.pk) relationship with the child
    * row count and the orphan count (child rows whose FK value has no
    * matching parent row; NULL FKs count as orphans — a row that can't
    * prove its parent exists hasn't got one). The warehouse-wide
    * constraint sweep run before trusting any join-based metric.
    *
    * Scale shape: each edge is one left_anti join — Spark broadcasts
    * the parent's distinct-key projection when small (dimensions) and
    * shuffle-antis otherwise; only (name, two counts) leave the
    * executors. Edges are independent jobs unioned at the end, so the
    * sweep parallelizes trivially across an orchestrator too.
    */
  def referentialAudit(
      edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(edges.nonEmpty, "no FK edges declared")
    edges.map { case (name, child, fk, parent, pk) =>
      val parents = parent.select(col(pk).as("__pk")).distinct()
      val orphans = child.select(col(fk).as("__pk"))
        .join(parents, Seq("__pk"), "left_anti")
      child.agg(count(lit(1)).cast("long").as("n_child"))
        .crossJoin(orphans.agg(count(lit(1)).cast("long").as("n_orphans")))
        .select(lit(name).as("relationship"), col("n_child"), col("n_orphans"))
    }.reduce(_ unionByName _)
      .orderBy(col("relationship"))
  }

  /** k-anonymity audit over a quasi-identifier tuple: the size of every
    * equivalence class and whether it violates the k threshold — the
    * re-identification check run before any pseudonymized export
    * (Sweeney's k-anonymity; a class smaller than k pins an individual
    * to <= k-1 alternatives). One partial-first aggregate; output is
    * |distinct quasi tuples| rows, grouped-count shaped at any scale.
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String], k: Int = 10): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityAudit: no quasi columns")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"))
      .withColumn("violates_k", (col("n") < k).cast("int"))
      .orderBy(quasiCols.map(col): _*)
  }

  /** l-diversity audit (Machanavajjhala et al. 2007): for each
    * quasi-identifier equivalence class, the number of DISTINCT
    * sensitive values it contains — k-anonymity's complement (a class
    * can be large yet expose everyone's sensitive attribute if all
    * members share one value). Classes below `l` distinct values
    * violate. One grouped count-distinct; |classes| output rows.
    */
  def lDiversityAudit(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Int = 3): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversityAudit: no quasi columns")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"),
        countDistinct(col(sensitiveCol)).cast("long").as("diversity"))
      .withColumn("violates_l", (col("diversity") < l).cast("int"))
      .orderBy(quasiCols.map(col): _*)
  }

  /** Duplicate-key screen: every key tuple that appears more than
    * `maxAllowed` times, with its multiplicity — the generic
    * "same customer, same day, N orders" / double-ingestion check run
    * before trusting a table as unique on a business key. One
    * partial-first grouped count filtered server-side; output is only
    * the violating tuples, so the result is alert-sized at any scale.
    */
  def duplicateKeyScreen(
      df: DataFrame,
      keyCols: Seq[String],
      maxAllowed: Long = 1L): DataFrame = {
    require(keyCols.nonEmpty, "duplicateKeyScreen: no key columns")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_rows"))
      .filter(col("n_rows") > maxAllowed)
      .orderBy(keyCols.map(col): _*)
  }

  /** ANALYZE-style per-column statistics: row count, null count,
    * exact distinct count, and (for orderable numeric / timestamp
    * columns) min and max on a canonical numeric axis — doubles for
    * numerics, epoch micros for timestamps, epoch days for dates, NULL
    * for strings/binary (their min/max would drag collation and
    * formatting differences into the contract). This is the stats
    * table an optimizer or a data catalog ingests, and the first
    * profiling pass any new dataset gets.
    *
    * Plan shape — ONE scan, ONE wide shuffle, and it is the 100x-scale
    * plan: each row unpivots to (column, canonical value string,
    * numeric axis) triples; a map-side-partial aggregate keyed by
    * (column, value) folds duplicates to per-distinct-value counts
    * (carrying the axis along — it is constant within the group); a
    * tiny second aggregate per column then reads every statistic off
    * that frame: n_rows = sum of counts, n_nulls = the null group's
    * count, ndv = non-null group count (COUNT(DISTINCT x) ignores
    * nulls), min/max = min/max of the axis. No per-column
    * RewriteDistinctAggregates row expansion (the all-in-one
    * formulation paid a |columns|-way expand to feed exact
    * count-distincts), no value buffering, and the shuffle carries
    * each distinct (column, value) once — exactly the plan that still
    * works when one column holds 1e12 distincts. Floating values
    * normalize -0.0 to +0.0 before the string render so the distinct
    * grid matches numeric equality; every other canonical render
    * (int / date / timestamp / shortest-round-trip double) is 1:1.
    */
  def tableStats(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val fields = df.schema.fields
    def axis(f: StructField): Column = f.dataType match {
      case _: NumericType => col(f.name).cast("double")
      // NTZ (how Spark 4 surfaces parquet isAdjustedToUTC=false) casts
      // through TimestampType in the session zone — UTC by session
      // contract, so the epoch agrees with DuckDB's epoch_us
      case _: TimestampType | _: TimestampNTZType =>
        unix_micros(col(f.name).cast("timestamp")).cast("double")
      case _: DateType => datediff(col(f.name), lit("1970-01-01")).cast("double")
      case _ => lit(null).cast("double")
    }
    // Distinct grid keys are 8-byte xxhash64 FINGERPRINTS of the value,
    // not canonical strings: same policy (and same collision budget,
    // P ~ n^2/2^65 per column) as the shingle/dedup pipelines, and it
    // removes the shortest-round-trip double/timestamp string renders
    // from the per-row kernel plus the string bytes from the shuffle.
    // Combined with Tables.spread on the scan below (the |columns|-way
    // explode is compute-dense; single-row-group fixture scans would
    // run it on one task), measured 0.93s -> 0.78-0.91s single-rep at
    // sf0.1 under comparable ambient load. -0.0 folds into +0.0 BEFORE
    // hashing so the grid matches numeric equality; nulls stay a null
    // key (xxhash64 would silently return the seed for null —
    // indistinguishable from a real value).
    def fp(f: StructField): Column = {
      val v = f.dataType match {
        case DoubleType | FloatType => (col(f.name) + lit(0.0)).cast("double")
        case _ => col(f.name)
      }
      when(col(f.name).isNotNull, xxhash64(v))
    }
    val byValue = graft.Tables.spread(df).select(explode(array(fields.map(f =>
        struct(lit(f.name).as("c"), fp(f).as("v"), axis(f).as("ax"))).toSeq: _*)).as("p"))
      .select(col("p.c").as("column"), col("p.v").as("__v"), col("p.ax").as("__ax"))
      .groupBy(col("column"), col("__v"))
      .agg(count(lit(1)).cast("long").as("__n"), min(col("__ax")).as("__ax"))
    byValue.groupBy(col("column"))
      .agg(sum(col("__n")).cast("long").as("n_rows"),
        coalesce(sum(when(col("__v").isNull, col("__n"))), lit(0L))
          .cast("long").as("n_nulls"),
        count(when(col("__v").isNotNull, lit(1))).cast("long").as("ndv"),
        min(col("__ax")).as("min_num"), max(col("__ax")).as("max_num"))
      .orderBy(col("column"))
  }
}
