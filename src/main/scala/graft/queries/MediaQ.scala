package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.media.Media
import org.apache.spark.sql.functions._

/** Multimodal-column gate queries: binary payload metadata is
  * relational like everything else (kind, byte length, content
  * fingerprint); the decode stage itself lives in [[graft.media.Media]]
  * behind the stubbed codec.
  */
object MediaQ extends QueryPack {

  /** Typed metadata over binary payloads, cross-checked byte-for-byte:
    * payload bytes, md5 prefix fingerprint, kind derived from the id.
    */
  val qMediaMeta: Q = Q(
    "q_media_meta",
    Some("""SELECT doc_id AS media_id,
            CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
            octet_length(encode(text)) AS n_bytes,
            substr(md5(text), 1, 16) AS fingerprint
            FROM documents ORDER BY media_id"""),
    (s, dir) =>
      Media.syntheticMedia(Tables.loadDistributed(s, dir, "documents", "doc_id"))
        .select(
          col("media_id"),
          col("kind"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          substring(md5(col("payload")), 1, 16).as("fingerprint"))
        .orderBy(col("media_id")))

  /** Per-kind payload volume — the partition-level stats a media
    * pipeline plans batch sizes from.
    */
  val qMediaStats: Q = Q(
    "q_media_stats",
    Some("""SELECT kind, count(*) AS n, CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
            round(avg(octet_length(encode(text))), 2) AS avg_bytes
            FROM (SELECT text,
                  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind
                  FROM documents)
            GROUP BY kind ORDER BY kind"""),
    (s, dir) =>
      Media.syntheticMedia(Tables.loadDistributed(s, dir, "documents", "doc_id"))
        .groupBy(col("kind"))
        .agg(
          count(lit(1)).as("n"),
          sum(octet_length(col("payload"))).cast("long").as("total_bytes"),
          round(avg(octet_length(col("payload"))), 2).as("avg_bytes"))
        .orderBy(col("kind")))

  /** Frame sampling as a relational transform: video payloads split into
    * fixed 16-byte frames, every 4th frame kept, the sampled stream
    * fingerprinted — the deterministic skeleton of decode→sample→hash
    * that [[Media.sampleFrames]] runs over the typed Dataset.
    */
  val qFrameSample: Q = Q(
    "q_frame_sample",
    Some("""SELECT doc_id AS media_id,
                   CAST(length(text) // 16 AS BIGINT) AS n_frames,
                   CAST(len([i FOR i IN range(0, CAST(length(text) // 16 AS INT)) IF i % 4 = 0]) AS BIGINT) AS n_sampled,
                   substr(md5(array_to_string(
                     [substr(text, 1 + 16 * i, 16)
                      FOR i IN range(0, CAST(length(text) // 16 AS INT)) IF i % 4 = 0], '')), 1, 16) AS sample_fp
            FROM documents
            WHERE CAST(doc_id % 3 AS INT) = 2
            ORDER BY media_id"""),
    (s, dir) => {
      val nFrames = floor(length(col("text")) / 16).cast("long")
      // sequence(0, n-1) would generate a DESCENDING range when n = 0
      // (empty docs exist) — guard to an empty array like DuckDB's range
      val sampledIdx = when(nFrames > 0,
        filter(sequence(lit(0), nFrames.cast("int") - 1), i => i % 4 === 0))
        .otherwise(array().cast("array<int>"))
      Tables.loadDistributed(s, dir, "documents", "doc_id")
        .filter((col("doc_id") % 3).cast("int") === 2)
        .select(
          col("doc_id").as("media_id"),
          nFrames.as("n_frames"),
          size(sampledIdx).cast("long").as("n_sampled"),
          substring(md5(
            array_join(transform(sampledIdx, i => col("text").substr(lit(1) + lit(16) * i, lit(16))), "")),
            1, 16).as("sample_fp"))
        .orderBy(col("media_id"))
    })

  /** Chunk sharding — the transport step before any decode fan-out:
    * every payload split into fixed 64-byte chunks with offsets and
    * per-chunk fingerprints, one output row per (media, chunk). The
    * Spark side slices the BINARY payload (byte-based substring +
    * md5-over-bytes); the oracle slices the source text — identical
    * bytes because payloads are the UTF-8 encoding of ASCII text. At
    * scale this is the explode that re-partitions work from documents
    * to chunk-level parallelism; everything stays codegen'd column ops.
    */
  val qMediaChunks: Q = Q(
    "q_media_chunks",
    Some("""SELECT doc_id AS media_id,
                   CAST(i AS BIGINT) AS chunk_idx,
                   CAST(1 + 64 * i AS BIGINT) AS offset,
                   CAST(octet_length(encode(substr(text, CAST(1 + 64 * i AS INT), 64))) AS BIGINT) AS chunk_bytes,
                   substr(md5(substr(text, CAST(1 + 64 * i AS INT), 64)), 1, 16) AS chunk_fp
            FROM (SELECT doc_id, text,
                         unnest(range(0, CAST(ceil(length(text) / 64.0) AS INT))) AS i
                  FROM documents WHERE length(text) > 0)
            ORDER BY media_id, chunk_idx"""),
    (s, dir) =>
      Media.syntheticMedia(Tables.loadDistributed(s, dir, "documents", "doc_id"))
        .filter(octet_length(col("payload")) > 0)
        .select(
          col("media_id"), col("payload"),
          explode(sequence(lit(0),
            ceil(octet_length(col("payload")) / lit(64.0)).cast("int") - 1)).as("i"))
        .select(
          col("media_id"),
          col("i").cast("long").as("chunk_idx"),
          (lit(1) + lit(64) * col("i")).cast("long").as("offset"),
          octet_length(col("payload").substr(lit(1) + lit(64) * col("i"), lit(64)))
            .cast("long").as("chunk_bytes"),
          substring(md5(col("payload").substr(lit(1) + lit(64) * col("i"), lit(64))), 1, 16)
            .as("chunk_fp"))
        .orderBy(col("media_id"), col("chunk_idx")))

  /** Batched resize through the typed Dataset path ([[Media.resize]]:
    * mapPartitions + grouped batches over the stub kernel) with the
    * metadata contract replayed by the oracle: aspect-preserving fit
    * into 128×96, never upscaling, payload shrunk by the area ratio;
    * zero-dim (audio) records pass through untouched. Both engines
    * compute the identical IEEE double scale/floor chain, so the gate
    * pins the exact output dims and byte counts.
    */
  val qMediaResize: Q = Q(
    "q_media_resize",
    Some("""WITH m AS (
              SELECT doc_id AS media_id,
                     CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                     octet_length(encode(text)) AS n
              FROM documents),
            d AS (
              SELECT media_id, kind, n,
                     CASE kind WHEN 'image' THEN n % 640 + 1 WHEN 'audio' THEN 0 ELSE n % 320 + 1 END AS w,
                     CASE kind WHEN 'image' THEN n % 480 + 1 WHEN 'audio' THEN 0 ELSE n % 240 + 1 END AS h
              FROM m),
            r AS (
              SELECT media_id, kind, n, w, h,
                     CASE WHEN w <= 0 OR h <= 0 THEN NULL
                          ELSE least(least(128.0 / w, 96.0 / h), 1.0) END AS scale
              FROM d)
            SELECT media_id, kind,
                   CAST(CASE WHEN scale IS NULL THEN w
                        ELSE greatest(1, CAST(floor(w * scale) AS BIGINT)) END AS BIGINT) AS out_w,
                   CAST(CASE WHEN scale IS NULL THEN h
                        ELSE greatest(1, CAST(floor(h * scale) AS BIGINT)) END AS BIGINT) AS out_h,
                   CAST(CASE WHEN scale IS NULL THEN n
                        ELSE greatest(1, CAST(floor(n * scale * scale) AS BIGINT)) END AS BIGINT) AS out_bytes
            FROM r ORDER BY media_id"""),
    (s, dir) => {
      import s.implicits._
      val media = Media.syntheticMedia(Tables.loadDistributed(s, dir, "documents", "doc_id"))
        .as[Media.MediaRecord]
      Media.resize(media, maxW = 128, maxH = 96).toDF()
        .select(
          col("media_id"), col("kind"),
          col("declared_w").cast("long").as("out_w"),
          col("declared_h").cast("long").as("out_h"),
          octet_length(col("payload")).cast("long").as("out_bytes"))
        .orderBy(col("media_id"))
    })

  override def queries: Seq[Q] =
    Seq(qMediaMeta, qMediaStats, qFrameSample, qMediaChunks, qMediaResize)
}
