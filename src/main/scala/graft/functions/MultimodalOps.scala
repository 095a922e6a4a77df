package graft.functions

import graft.{Query, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata (training-data-pipeline
  * mandate).
  *
  * The container has no media codecs, so the decode step is a STUB — a
  * deterministic fake "decoder" ([[FakeMedia.decode]]) — but the
  * Spark-side plumbing is real: a binary column, a typed batch decode
  * over `mapPartitions` (one decoder init per partition, the same batch
  * shape a JNI/FFI decoder would need), and a columnar metadata path
  * that stays inside WholeStageCodegen.
  */
object MultimodalOps {

  /** A decoded media record — what a real image decoder would yield. */
  final case class MediaMeta(
      doc_id: Long, byte_len: Long, width: Long, height: Long,
      frames: Long, digest: String)

  /** STUBBED decoder: a real implementation would parse the codec
    * header / frames here (e.g. via a per-partition JNI handle). The
    * fake derives deterministic "dimensions" from the payload so tests
    * and oracles stay exact. */
  object FakeMedia {
    def decode(docId: Long, payload: Array[Byte], nChars: Long): MediaMeta = {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(payload).map("%02x".format(_)).mkString
      MediaMeta(
        doc_id = docId,
        byte_len = payload.length.toLong,
        width = payload.length.toLong % 640 + 1,
        height = nChars % 480 + 1,
        frames = docId % 30 + 1,
        digest = digest)
    }
  }

  /** Typed batch-decode path: binary payloads → `mapPartitions` decode
    * (per-partition decoder lifecycle, vectorizable batch shape). Used
    * by tests to prove the plumbing; q36 computes the same result
    * columnar for the oracle. */
  def decodeMedia(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("n_chars"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { rows =>
        // one decoder init per partition would live here
        rows.map { case (id, payload, nChars) => FakeMedia.decode(id, payload, nChars) }
      }
  }

  /** Q36 — multimodal metadata extraction, columnar formulation (binary
    * cast + octet_length + sha2 + the deterministic fake-decode
    * arithmetic), hash-checked against DuckDB. */
  val q36 = Query(
    "q36_multimodal_meta",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          octet_length(col("text").cast("binary")).cast("long").as("byte_len"),
          (octet_length(col("text").cast("binary")).cast("long") % 640 + 1).as("width"),
          (col("n_chars") % 480 + 1).as("height"),
          (col("doc_id") % 30 + 1).as("frames"),
          sha2(col("text").cast("binary"), 256).as("digest"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
           |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
           |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) % 640 + 1 AS width,
           |  n_chars % 480 + 1 AS height,
           |  doc_id % 30 + 1 AS frames,
           |  sha256(text) AS digest
           |FROM documents ORDER BY doc_id""".stripMargin)
  )

  /** Q63 — frame sampling: every 5th frame index of each "video"
    * (frame count from the fake decode), with a derived capture
    * timestamp at 24 fps. Rows-from-nothing via `sequence`+`explode` —
    * the Generate is bounded per row by the frame count, so output
    * scales with Σframes, never with a cross join. */
  val q63 = Query(
    "q63_frame_sample",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), (col("doc_id") % 30 + 1).as("frames"))
        .select(col("doc_id"), col("frames"),
          explode(sequence(lit(0L), col("frames") - 1, lit(5L))).as("frame_idx"))
        .withColumn("t_sec", col("frame_idx").cast("double") / 24.0)
        .orderBy("doc_id", "frame_idx"),
    Some("""SELECT doc_id, frames, frame_idx,
           |       CAST(frame_idx AS DOUBLE) / 24.0 AS t_sec
           |FROM (
           |  SELECT doc_id, doc_id % 30 + 1 AS frames,
           |         unnest(range(0, doc_id % 30 + 1, 5)) AS frame_idx
           |  FROM documents)
           |ORDER BY doc_id, frame_idx""".stripMargin)
  )

  /** Q64 — deterministic feature extraction from the binary payload:
    * four pseudo-embedding dimensions derived from md5 nibbles of the
    * payload, normalized to [0,1]. Stands in for a real
    * per-partition-initialized featurizer with the same plan shape —
    * pure map-side expression work, no shuffle until the output sort. */
  val q64 = Query(
    "q64_feature_extract",
    (s, dir) => {
      val h = md5(col("text").cast("binary"))
      def f(k: Int) =
        (conv(substring(h, k * 4 + 1, 4), 16, 10).cast("double") / 65535.0)
          .as(s"f$k")
      Tables.documents(s, dir)
        .select(col("doc_id"), f(0), f(1), f(2), f(3))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  CAST(CAST(concat('0x', substr(md5(text), 1,  4)) AS BIGINT) AS DOUBLE) / 65535.0 AS f0,
           |  CAST(CAST(concat('0x', substr(md5(text), 5,  4)) AS BIGINT) AS DOUBLE) / 65535.0 AS f1,
           |  CAST(CAST(concat('0x', substr(md5(text), 9,  4)) AS BIGINT) AS DOUBLE) / 65535.0 AS f2,
           |  CAST(CAST(concat('0x', substr(md5(text), 13, 4)) AS BIGINT) AS DOUBLE) / 65535.0 AS f3
           |FROM documents ORDER BY doc_id""".stripMargin)
  )

  /** Q82 — media bundle index (the WebDataset/tar-shard pattern): small
    * binary payloads are grouped into ~16 KB bundles per language so a
    * 100 TB corpus reads as sequential multi-megabyte objects instead
    * of billions of tiny files. A payload's bundle is decided by its
    * START byte in the per-lang concatenation (`start div budget`), so
    * assignment is a pure window expression — no sequential greedy loop
    * — and every payload lives in exactly one bundle (bundles overshoot
    * by at most one payload, the standard approximation). Output is the
    * byte-offset INDEX (oracle-checked); the bundle bytes themselves
    * are materialized and sliced back in ScalaTest
    * ([[buildBundles]]). */
  val q82 = Query(
    "q82_media_bundles",
    (s, dir) => {
      val budget = 16384L
      val wLang = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sized = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          octet_length(col("text").cast("binary")).cast("long").as("len_bytes"))
        .withColumn("start_byte", sum(col("len_bytes")).over(wLang) - col("len_bytes"))
        .withColumn("bundle_id", expr(s"start_byte div $budget"))
      val wBundle = Window.partitionBy("lang", "bundle_id").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sized
        .withColumn("offset_bytes",
          sum(col("len_bytes")).over(wBundle) - col("len_bytes"))
        .select("doc_id", "lang", "bundle_id", "offset_bytes", "len_bytes")
        .orderBy("doc_id")
    },
    Some("""WITH sized AS (
           |  SELECT doc_id, lang,
           |         CAST(octet_length(encode(text)) AS BIGINT) AS len_bytes
           |  FROM documents),
           |o AS (
           |  SELECT *,
           |         CAST(SUM(len_bytes) OVER (PARTITION BY lang ORDER BY doc_id
           |              ROWS UNBOUNDED PRECEDING) - len_bytes AS BIGINT) AS start_byte
           |  FROM sized),
           |b AS (SELECT *, start_byte // 16384 AS bundle_id FROM o)
           |SELECT doc_id, lang, bundle_id,
           |       CAST(SUM(len_bytes) OVER (PARTITION BY lang, bundle_id ORDER BY doc_id
           |            ROWS UNBOUNDED PRECEDING) - len_bytes AS BIGINT) AS offset_bytes,
           |       len_bytes
           |FROM b ORDER BY doc_id""".stripMargin)
  )

  /** One materialized bundle: lang, bundle id, bytes, and the member
    * count — what actually lands in object storage. */
  final case class Bundle(lang: String, bundle_id: Long, n_parts: Long,
      bytes: Array[Byte])

  /** Materialize the Q82 bundles: payloads of a (lang, bundle) group
    * concatenated in doc_id order. Typed `mapGroups` because binary
    * concatenation is not an SQL aggregate; groups are bundle-sized by
    * construction so the per-group buffer is bounded by the budget plus
    * one payload. */
  def buildBundles(spark: SparkSession, dir: String): Dataset[Bundle] = {
    import spark.implicits._
    val idx = q82.build(spark, dir)
      .select(col("doc_id"), col("lang"), col("bundle_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .join(idx, "doc_id")
      .select(col("lang"), col("bundle_id"), col("doc_id"), col("payload"))
      .as[(String, Long, Long, Array[Byte])]
      .groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (String, Long),
          rows: Iterator[(String, Long, Long, Array[Byte])]) =>
        val parts = rows.toSeq.sortBy(_._3)
        Bundle(key._1, key._2, parts.size.toLong,
          parts.iterator.map(_._4).reduce(_ ++ _))
      }
  }

  val all: Seq[Query] = Seq(q36, q63, q64, q82)
}
