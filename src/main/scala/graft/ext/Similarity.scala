package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity over the `embeddings` fixture
  * (vec_id, embedding array<float> dim=64, label).
  *
  * Built-in higher-order functions only (zip_with/aggregate/transform) —
  * codegen'd, no UDF. Vectors are cast to double before any arithmetic so
  * both engines (and any partitioning) produce identical per-pair values.
  *
  * Scale paths: brute force is the correctness baseline (O(n) per query,
  * O(n^2) pairwise); random-hyperplane LSH buckets cut the candidate set
  * for both ANN queries and near-dup sweeps.
  */
object Similarity {

  /** Dot product via the native codegen'd expression
    * [[graft.ext.expr.ArrayDotProduct]] (`graft_dot`). Callers at the
    * DataFrame level must ensure the function is registered on the
    * session ([[graft.ext.expr.ArrayDotProduct.ensureRegistered]]) —
    * every public op in this object does.
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Built-in-only dot product (aggregate/zip_with) — interpreted
    * (~50x slower at dim 64); kept as the zero-registration fallback.
    * Matches [[dot]] for equal-length arrays (the vector case). They
    * diverge on ragged inputs: zip_with pads the shorter array with
    * nulls so this returns NULL, while the native expression iterates
    * min(length) and returns a number.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two array<float|double> columns. The native
    * expression widens float elements to double per-element, so no
    * array-copying cast is needed on the inputs.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Brute-force top-k nearest neighbours of `queryVecId` by cosine.
    * The one-row query side is broadcast, so the plan is a single
    * map-side pass over embeddings + TakeOrderedAndProject — no shuffle
    * of the corpus. This is the exact baseline ANN answers are judged
    * against.
    */
  def bruteForceTopK(embeddings: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    graft.ext.expr.ArrayDotProduct.ensureRegistered(embeddings.sparkSession)
    val q = broadcast(
      embeddings.filter(col("vec_id") === queryVecId)
        .select(col("embedding").as("q_emb")))
    embeddings
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(q)
      .select(col("vec_id"), Num.trunc4(cosine(col("embedding"), col("q_emb"))).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Deterministic pseudo-random unit hyperplanes (seeded) — generated on
    * the driver, embedded as literals, broadcast with the plan.
    */
  private def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  private def planeLit(p: Array[Double]): Column = array(p.map(lit(_)): _*)

  /** Sign-bit LSH bucket id for a vector: bit i = (v . plane_i) >= 0. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, planeLit(p)) >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce((a: Column, b: Column) => a.bitwiseOR(b))

  /** LSH-bucketed approximate top-k: `numTables` independent sign-LSH
    * tables; candidates = vectors sharing the query's bucket in ANY
    * table; exact cosine on candidates only. At corpus scale the bucket
    * map-side filter replaces the full scan with ~n/2^numPlanes
    * candidates per table.
    */
  def annTopK(
      embeddings: DataFrame,
      queryVecId: Long,
      k: Int,
      numPlanes: Int = 8,
      numTables: Int = 4,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    graft.ext.expr.ArrayDotProduct.ensureRegistered(embeddings.sparkSession)
    val tables = (0 until numTables).map(t => hyperplanes(numPlanes, dim, seed + t))
    val bucketCols = tables.zipWithIndex.map { case (planes, t) =>
      lshBucket(col("embedding"), planes).as(s"bkt$t")
    }
    val withBuckets = embeddings.select(col("vec_id") +: col("embedding") +: bucketCols: _*)
    val q = broadcast(
      withBuckets.filter(col("vec_id") === queryVecId)
        .select(col("embedding").as("q_emb") +:
          (0 until numTables).map(t => col(s"bkt$t").as(s"q_bkt$t")): _*))
    val sameBucket = (0 until numTables)
      .map(t => col(s"bkt$t") === col(s"q_bkt$t"))
      .reduce(_ || _)
    withBuckets
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(q)
      .filter(sameBucket)
      .select(col("vec_id"), Num.trunc4(cosine(col("embedding"), col("q_emb"))).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Top pairwise cosine pairs (embedding near-dup sweep). Exact O(n^2),
    * computed as a broadcast-corpus mapPartitions kernel: the corpus is
    * collected once into primitive double arrays and broadcast (the same
    * build step a broadcast hash join performs), then each partition
    * scores its own rows against the corpus with tight primitive loops
    * and keeps a bounded top heap. ~1000x faster than evaluating the
    * cosine through interpreted higher-order functions on 10^6+ pairs,
    * and the scoring stays fully distributed.
    *
    * Scale ceiling: broadcast side is n*dim*8 bytes (~0.5 GB at 1M x 64),
    * the executor-memory regime where a broadcast join also stops; past
    * that, block the corpus with [[lshCosinePairs]]-style sign-LSH
    * buckets so each partition only scores its bucket.
    *
    * Determinism vs the DuckDB oracle: dot/norm accumulate in index
    * order (same association as list_dot_product), division happens
    * once per pair, rounding once at the end — bit-identical doubles.
    */
  def topCosinePairs(embeddings: DataFrame, k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val ds = embeddings
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
    val corpus = ds.collect().sortBy(_._1)
    val ids = corpus.map(_._1)
    val vecs = corpus.map(_._2)
    val norms = vecs.map { v =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((ids, vecs, norms))
    // Per-partition keep-list is k + slack: partitions prune on RAW
    // cosine while the final global order uses the ROUNDED value, so a
    // raw-order near-tie at the k boundary must not be droppable.
    val slack = k + 64
    // "Worst kept on top" ordering: lowest cos first, then largest ids.
    val worstFirst: Ordering[(Long, Long, Double)] =
      Ordering.by { case (a, b, c) => (-c, a, b) }
    val partTop = ds.mapPartitions { rows =>
      val (ids, vecs, norms) = bc.value
      val pq = scala.collection.mutable.PriorityQueue.empty[(Long, Long, Double)](worstFirst)
      rows.foreach { case (ida, va) =>
        var na = 0.0
        var i = 0
        while (i < va.length) { na += va(i) * va(i); i += 1 }
        na = math.sqrt(na)
        // pairs are ordered (ida < idb): score only ids strictly above ida
        var j = java.util.Arrays.binarySearch(ids, ida)
        j = if (j >= 0) j + 1 else -(j + 1)
        while (j < ids.length) {
          val vb = vecs(j)
          var dot = 0.0
          var d = 0
          while (d < va.length) { dot += va(d) * vb(d); d += 1 }
          val cos = dot / (na * norms(j))
          val cand = (ida, ids(j), cos)
          if (pq.size < slack) pq.enqueue(cand)
          else if (worstFirst.lt(cand, pq.head)) { pq.dequeue(); pq.enqueue(cand) }
          j += 1
        }
      }
      pq.iterator
    }
    partTop.toDF("vec_a", "vec_b", "cos")
      .select(col("vec_a"), col("vec_b"), Num.trunc4(col("cos")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_a"), col("vec_b"))
      .limit(k)
  }

  /** IVF-Flat approximate top-k: spherical k-means coarse quantizer
    * (seeded deterministic init + `iters` distributed Lloyd rounds),
    * every vector assigned to its nearest centroid ("inverted list"),
    * queries probe only the `nProbe` nearest lists and score those
    * candidates exactly.
    *
    * Scale shape: training touches each vector `iters` times map-side
    * (aggregateByKey carries numCentroids x dim partial sums, nothing
    * row-proportional crosses the wire); at query time the candidate
    * scan is ~nProbe/numCentroids of the corpus. At 100 TB the
    * assignment would be precomputed once and the table bucketed by
    * cluster id so a probe is a partition-pruned read.
    *
    * Complements [[annTopK]] (sign-LSH): IVF adapts to the data
    * distribution (learned centroids) where LSH is data-oblivious.
    */
  def ivfTopK(
      embeddings: DataFrame,
      queryVecId: Long,
      k: Int,
      numCentroids: Int = 16,
      nProbe: Int = 4,
      iters: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val ds = embeddings
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]

    def normalize(v: Array[Double]): Array[Double] = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0) v else v.map(_ / n)
    }
    def nearest(cs: Array[Array[Double]], v: Array[Double]): Int = {
      var best = 0; var bestDot = Double.NegativeInfinity
      var c = 0
      while (c < cs.length) {
        val cv = cs(c)
        var d = 0.0; var i = 0
        while (i < v.length) { d += v(i) * cv(i); i += 1 }
        if (d > bestDot) { bestDot = d; best = c }
        c += 1
      }
      best
    }

    // Deterministic spread init: the numCentroids vectors with smallest
    // xxhash64(vec_id) (a seeded pseudo-random sample without an RNG).
    var centroids: Array[Array[Double]] = ds
      .select(xxhash64(col("vec_id")).as("h"), col("embedding"))
      .orderBy(col("h")).limit(numCentroids)
      .as[(Long, Array[Double])].collect().map(p => normalize(p._2))

    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val dim = centroids.head.length
      val sums = ds.rdd
        .map { case (_, v) => val nv = normalize(v); (nearest(bc.value, nv), nv) }
        .aggregateByKey((new Array[Double](dim), 0L))(
          { case ((acc, n), v) =>
            var i = 0; while (i < dim) { acc(i) += v(i); i += 1 }; (acc, n + 1) },
          { case ((a, na), (b, nb)) =>
            var i = 0; while (i < dim) { a(i) += b(i); i += 1 }; (a, na + nb) })
        .collect().toMap
      centroids = centroids.indices.map { c =>
        sums.get(c).filter(_._2 > 0)
          .map { case (s, n) => normalize(s.map(_ / n)) }
          .getOrElse(centroids(c)) // empty cluster keeps its centroid
      }.toArray
    }

    val bcFinal = spark.sparkContext.broadcast(centroids)
    val qRows = ds.filter(_._1 == queryVecId).take(1)
    if (qRows.isEmpty) {
      // match bruteForceTopK/annTopK: unknown query id -> empty result
      return ds.sparkSession.emptyDataFrame
        .withColumn("vec_id", lit(0L)).withColumn("cos_sim", lit(0.0)).limit(0)
    }
    val qVec = normalize(qRows.head._2)
    val probes: Set[Int] = centroids.indices
      .sortBy { c => -centroids(c).zip(qVec).map { case (a, b) => a * b }.sum }
      .take(nProbe).toSet
    ds.filter(_._1 != queryVecId)
      .mapPartitions { rows =>
        val cs = bcFinal.value
        rows.flatMap { case (id, v) =>
          val nv = normalize(v)
          if (!probes.contains(nearest(cs, nv))) None
          else {
            var d = 0.0; var i = 0
            while (i < nv.length) { d += nv(i) * qVec(i); i += 1 }
            Some((id, d))
          }
        }
      }
      .toDF("vec_id", "cos")
      .select(col("vec_id"), Num.trunc4(col("cos")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Sign-LSH-blocked near-dup pair sweep — the 100 TB path for
    * [[topCosinePairs]]: bucket every vector into `numTables`
    * independent sign-LSH buckets, self-join WITHIN buckets only (the
    * shuffle key is the bucket, so no cross join ever materializes),
    * score candidates exactly, global top-k. Approximate: recall is the
    * standard sign-LSH bound (high for near-duplicate-grade cosines).
    */
  def lshCosinePairs(
      embeddings: DataFrame,
      k: Int,
      numPlanes: Int = 8,
      numTables: Int = 4,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    graft.ext.expr.ArrayDotProduct.ensureRegistered(embeddings.sparkSession)
    val tables = (0 until numTables).map(t => hyperplanes(numPlanes, dim, seed + t))
    val bucketed = embeddings.select(
      col("vec_id"), col("embedding"),
      explode(array(tables.zipWithIndex.map { case (planes, t) =>
        struct(lit(t).as("tbl"), lshBucket(col("embedding"), planes).as("bkt"))
      }: _*)).as("tb"))
      .select(col("vec_id"), col("embedding"), col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
    val a = bucketed.select(col("tbl"), col("bkt"), col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = bucketed.select(col("tbl"), col("bkt"), col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(b, Seq("tbl", "bkt")).filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        Num.trunc4(cosine(col("emb_a"), col("emb_b"))).as("cos_sim"))
      .distinct()
      .orderBy(col("cos_sim").desc, col("vec_a"), col("vec_b"))
      .limit(k)
  }
}
