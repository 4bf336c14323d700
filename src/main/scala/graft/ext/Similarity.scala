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

  private def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two array<float|double> columns. */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDouble(a)
    val bd = toDouble(b)
    dot(ad, bd) / (norm2(ad) * norm2(bd))
  }

  /** Brute-force top-k nearest neighbours of `queryVecId` by cosine.
    * The one-row query side is broadcast, so the plan is a single
    * map-side pass over embeddings + TakeOrderedAndProject — no shuffle
    * of the corpus. This is the exact baseline ANN answers are judged
    * against.
    */
  def bruteForceTopK(embeddings: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val q = broadcast(
      embeddings.filter(col("vec_id") === queryVecId)
        .select(col("embedding").as("q_emb")))
    embeddings
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(q)
      .select(col("vec_id"), round(cosine(col("embedding"), col("q_emb")), 4).as("cos_sim"))
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
      when(dot(toDouble(v), planeLit(p)) >= 0, shiftleft(lit(1L), i)).otherwise(0L)
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
      .select(col("vec_id"), round(cosine(col("embedding"), col("q_emb")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Top pairwise cosine pairs (embedding near-dup sweep). Exact O(n^2)
    * block-nested-loop — correctness baseline; the LSH-bucket join
    * (group by bucket, pair within bucket) is the 100 TB path.
    */
  def topCosinePairs(embeddings: DataFrame, k: Int): DataFrame = {
    val a = embeddings.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = embeddings.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("emb_a"), col("emb_b")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_a"), col("vec_b"))
      .limit(k)
  }
}
