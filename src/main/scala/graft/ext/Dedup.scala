package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication at training-data scale: exact (hash-groupBy),
  * word-shingle Jaccard, MinHash+LSH, SimHash. The `documents` fixture
  * contains planted near-duplicate pairs (Jaccard ~0.97-0.99), so every
  * op here has observable output.
  *
  * Scale architecture:
  *  - exact dedup: one shuffle on a 128-bit digest, never on the text.
  *  - pairwise Jaccard: shuffle on shingle (inverted index) — exact but
  *    O(pairs-sharing-a-shingle); the correctness backbone.
  *  - MinHash+LSH: the 100 TB path. Per-doc signature (map-side only),
  *    shuffle on (band, bucket) — candidates only, then exact-Jaccard
  *    verification restricted to candidates. With b=16 bands x r=4 rows,
  *    P(miss | J=0.9) = (1-0.9^4)^16 ~= 5e-8, so results match the exact
  *    contract "all pairs with J >= 0.9" (which is what the oracle checks).
  */
object Dedup {

  /** Exact dedup groups: group by normalized-text digest, keep the
    * smallest doc_id as canonical. Shuffles 16-byte digests, not text.
    */
  def exactDedup(docs: DataFrame): DataFrame =
    docs
      .groupBy(TextOps.fingerprintCol(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col("fp"))
      .orderBy(col("keep_id"))

  /** Distinct word n-gram shingles per document: (doc_id, s). */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val sh = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j + 1))): _*)))
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"), explode(sh).as("s")).distinct()
  }

  /** Exact pairwise Jaccard via inverted index: join docs on shared
    * shingle (never a cross join), count intersections, divide by union.
    * `minJaccard` prunes the output; the division is int/int -> double,
    * identical in any engine.
    */
  def pairJaccard(sh: DataFrame, minJaccard: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("s"))
    val b = sh.select(col("doc_id").as("doc_b"), col("s"))
    val inter = a.join(b, a("s") === b("s") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
    val j = inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("na") + col("nb") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
    j.select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Convenience: exact near-dup pairs straight from documents. */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, minJaccard: Double = 0.3): DataFrame =
    pairJaccard(shingles(docs, n), minJaccard)

  /** MinHash signatures: one row per doc with `numHashes` min-hash
    * columns h0..h{k-1}, computed as min over shingles of
    * xxhash64(hashIndex, shingle). Single groupBy — the signature is a
    * fixed-width sketch, so downstream shuffles carry O(k) longs per doc
    * regardless of document size.
    */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map(i => min(xxhash64(lit(i), col("s"))).as(s"h$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: hash each band of `rowsPerBand` consecutive signature
    * values to a bucket key; docs sharing any (band, bucket) are
    * candidates. Shuffle key is (band, bucket) — skew-free for random
    * hashes.
    */
  def lshCandidates(sig: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bandStructs = (0 until numBands).map { bnd =>
      val cols = (0 until rowsPerBand).map(r => col(s"h${bnd * rowsPerBand + r}"))
      struct(lit(bnd).as("band"), xxhash64(cols: _*).as("bucket"))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val l = bands.select(col("doc_id").as("doc_a"), col("band"), col("bucket"))
    val r = bands.select(col("doc_id").as("doc_b"), col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** Full MinHash+LSH near-dup pipeline: candidates from LSH, then exact
    * Jaccard verification restricted to candidates (left-semi prune of
    * the inverted index). Output contract: all pairs with J >= minJaccard
    * (within LSH recall, ~1-5e-8 at the default parameters for J>=0.9).
    */
  def minhashDedup(
      docs: DataFrame,
      n: Int = 3,
      numHashes: Int = 64,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.9): DataFrame = {
    val sh = shingles(docs, n)
    val cand = lshCandidates(minhashSignatures(sh, numHashes), numHashes, rowsPerBand)
    // Verify only candidate pairs: restrict both sides of the inverted
    // index to docs that appear in a candidate pair, then exact Jaccard.
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b"))).distinct()
    val shCand = sh.join(candDocs, "doc_id")
    pairJaccard(shCand, minJaccard)
      .join(cand, Seq("doc_a", "doc_b"), "left_semi")
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Portable 16-bit SimHash: per token, md5 nibbles 1..16 vote +1/-1 on
    * the corresponding bit; the sign of each bit-sum is the fingerprint
    * bit. md5-based so Spark and DuckDB compute identical fingerprints.
    * (The 64-bit xxhash64 variant below is the faster engine-local path.)
    */
  def simhash16(docs: DataFrame): DataFrame = {
    val tok = explode(TextOps.tokens(col("text"))).as("w")
    val exploded = docs.select(col("doc_id"), tok)
    val high = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val bitSums = (0 until 16).map { j =>
      sum(when(substring(md5(col("w")), j + 1, 1).isInCollection(high), 1L).otherwise(-1L))
        .as(s"b$j")
    }
    exploded.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        concat((0 until 16).map(j => when(col(s"b$j") >= 0, "1").otherwise("0")): _*)
          .as("simhash_bits"))
      .orderBy(col("doc_id"))
  }

  /** 64-bit SimHash fingerprint (xxhash64 bit votes) — engine-local
    * scale path; pair generation would band the 64 bits into 4x16-bit
    * blocks (hamming<=3 guarantees a matching block).
    */
  def simhash64(docs: DataFrame): DataFrame = {
    val exploded = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$j")
    }
    exploded.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j => when(col(s"b$j") >= 0, shiftleft(lit(1L), j)).otherwise(0L))
          .reduce((a: Column, b: Column) => a.bitwiseOR(b)).as("simhash64"))
      .orderBy(col("doc_id"))
  }
}
