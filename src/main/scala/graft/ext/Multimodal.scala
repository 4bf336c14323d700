package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads modelled as
  * opaque `binary` columns with typed metadata structs.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub (byte histogram standing in for
  * "decoded features"); everything Spark-side — schema, batching,
  * partition behavior, typed mapPartitions plumbing — is real and
  * tested, and a codec would drop into [[extractFeatures]] unchanged.
  */
object Multimodal {

  /** Attach a fake binary payload + metadata struct to documents:
    * `payload binary, meta struct<n_bytes bigint, n_frames bigint>`.
    * In production the payload column arrives from the source (parquet
    * binary / object-store pointers); derivation here is only for tests.
    */
  def withPayload(docs: DataFrame, frameBytes: Int = 32): DataFrame =
    docs
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("meta", struct(
        length(col("payload")).cast("bigint").as("n_bytes"),
        ceil(length(col("payload")) / lit(frameBytes.toDouble)).cast("bigint").as("n_frames")))

  /** Metadata projection — the cheap path that must NOT decode payloads:
    * column pruning means a 100 TB binary column is never read when only
    * meta is selected.
    */
  def binaryMeta(docs: DataFrame): DataFrame =
    withPayload(docs).select(
      col("doc_id"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.n_frames").as("n_frames"))
      .orderBy(col("doc_id"))

  /** Frame sampling: fixed-stride slices of the payload (video
    * frame-sample analogue), fingerprinted per frame. Pure built-ins —
    * explode(sequence) x substring — so it fuses into the scan.
    */
  def frameSample(docs: DataFrame, frameChars: Int = 32, maxFrames: Int = 4): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(maxFrames - 1))).as("frame_idx"))
      .filter(length(col("text")) >= col("frame_idx") * frameChars + 1)
      .select(col("doc_id"), col("frame_idx").cast("bigint").as("frame_idx"),
        md5(expr(s"substring(text, frame_idx * $frameChars + 1, $frameChars)")).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** DECODE STUB + feature extraction via typed mapPartitions — the
    * Scala analogue of a batched Pandas-UDF decode stage. Batch shape:
    * one partition of (id, payload) pairs in, one partition of fixed-dim
    * feature vectors out. Replace the histogram with a real codec call
    * for actual media.
    */
  def extractFeatures(docs: DataFrame, bins: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // ---- DECODE STUB: deterministic fake. A real implementation
          // would decode image/audio here; the container has no codecs.
          val hist = new Array[Float](bins)
          bytes.foreach(b => hist((b & 0xff) * bins / 256) += 1f)
          val n = math.max(bytes.length, 1).toFloat
          (id, bytes.length.toLong, hist.map(_ / n))
        }
      }
      .toDF("doc_id", "n_bytes", "features")
      .orderBy(col("doc_id"))
  }

  /** Driver-friendly projection of [[extractFeatures]]: the raw
    * `array<float>` column is reduced to two sortable scalars — an md5
    * digest of the vector (cross-row identity) and the argmax bin (the
    * dominant byte range, i.e. the stub's "top class"). Downstream
    * consumers that need the full vector call [[extractFeatures]];
    * result-exchange layers (and the DuckDB oracle) get hashable
    * columns. The digest is taken over the INTEGER bin counts — not the
    * normalized floats, whose engine-specific decimal formatting would
    * never hash-match — recovered exactly from `f = c/n` by
    * `round(f * n)` (float32 relative error 2^-24 times counts <= a few
    * thousand is far below 0.5). Argmax over counts == argmax over
    * normalized floats, so [[featureDigestOracleSql]] can replay both
    * from a plain byte histogram.
    */
  def featureDigest(docs: DataFrame, bins: Int = 16): DataFrame =
    extractFeatures(docs, bins)
      .select(
        col("doc_id"), col("n_bytes"),
        md5(concat_ws(",",
          transform(col("features"),
            f => round(f.cast("double") * greatest(col("n_bytes"), lit(1L)).cast("double"))
              .cast("long").cast("string")))).as("features_md5"),
        expr("array_position(features, array_max(features))").cast("bigint").as("argmax_bin"))
      .orderBy(col("doc_id"))

  /** DuckDB SQL replay of [[featureDigest]]: the decode stub is a
    * per-byte histogram (bin = byte div 16 with the default 16 bins),
    * which SQL rebuilds via `ascii(substr(text, pos, 1))` — exact on
    * this printable-ASCII fixture, where chars == UTF-8 bytes (the same
    * equivalence the green `m_pixel_stats` oracle already relies on).
    * Zero bins are materialized through a `range(bins)` cross join so
    * the digest covers all `bins` positions; `list_position(list(c),
    * max(c))` reproduces `array_position(features, array_max(...))`
    * first-max semantics.
    */
  def featureDigestOracleSql(bins: Int = 16, table: String = "documents"): String =
    s"""WITH h AS (
  SELECT doc_id, ascii(substr(text, pos, 1)) * $bins // 256 AS bin, CAST(COUNT(*) AS BIGINT) AS c
  FROM $table, unnest(range(1, length(text) + 1)) t(pos)
  GROUP BY 1, 2
),
v AS (
  SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_bytes, r.bin, COALESCE(h.c, 0) AS c
  FROM $table d CROSS JOIN range($bins) r(bin)
  LEFT JOIN h ON h.doc_id = d.doc_id AND h.bin = r.bin
)
SELECT doc_id, n_bytes,
  md5(string_agg(CAST(c AS VARCHAR), ',' ORDER BY bin)) AS features_md5,
  CAST(list_position(list(c ORDER BY bin), max(c)) AS BIGINT) AS argmax_bin
FROM v GROUP BY 1, 2 ORDER BY doc_id"""

  /** Cross-document FRAME dedup: fingerprints occurring in more than
    * one (doc, frame) slot — the video/image dedup shape (near-identical
    * media share frames even when containers differ). GroupBy on the
    * 16-byte digest: the shuffle never carries payload bytes, exactly
    * like text exact-dedup ([[graft.ext.Dedup.exactDedup]]).
    */
  def frameDedup(docs: DataFrame, frameChars: Int = 32, maxFrames: Int = 4): DataFrame =
    frameSample(docs, frameChars, maxFrames)
      .groupBy(col("frame_md5"))
      .agg(count(lit(1)).as("n_occurrences"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_occurrences") > 1)
      .orderBy(col("frame_md5"))

  /** Per-frame "pixel" statistics (brightness-profile analogue): byte
    * count, sum, min/max and an integer-scaled mean per sampled frame.
    * The stub decode is byte-value-as-pixel; a real image codec would
    * replace the `ascii(substring(...))` kernel with decoded luma and
    * every aggregate below survives unchanged. Pure built-ins, all
    * integer arithmetic (mean carried as floor(sum*100/n) — exact in
    * any engine), fuses into the scan up to the (doc, frame) aggregate.
    */
  def framePixelStats(docs: DataFrame, frameChars: Int = 32, maxFrames: Int = 4): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(maxFrames - 1))).as("frame_idx"))
      .filter(length(col("text")) >= col("frame_idx") * frameChars + 1)
      .select(col("doc_id"), col("frame_idx").cast("bigint").as("frame_idx"),
        expr(s"substring(text, frame_idx * $frameChars + 1, $frameChars)").as("frame"))
      .select(col("doc_id"), col("frame_idx"),
        explode(sequence(lit(1), length(col("frame")))).as("pos"), col("frame"))
      .select(col("doc_id"), col("frame_idx"),
        ascii(expr("substring(frame, pos, 1)")).cast("long").as("b"))
      .groupBy(col("doc_id"), col("frame_idx"))
      .agg(count(lit(1)).cast("long").as("n_px"),
        sum(col("b")).cast("long").as("sum_b"),
        min(col("b")).cast("long").as("min_b"),
        max(col("b")).cast("long").as("max_b"))
      .withColumn("mean_b2", expr("(sum_b * 100) div n_px"))
      .orderBy(col("doc_id"), col("frame_idx"))
}
