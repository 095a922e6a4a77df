package graft.functions

import graft.{Query, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata (training-data-pipeline
  * mandate).
  *
  * The image path is a REAL codec round trip: [[ImageCodec]] encodes
  * deterministic grayscale PNGs and decodes arbitrary payloads through
  * the JDK's `javax.imageio` (pure-Java PNG/JPEG plugins — no external
  * codecs needed, headless-safe). [[decodeMedia]] runs that decoder
  * over `mapPartitions` (per-partition decoder lifecycle, the batch
  * shape a JNI/FFI video decoder would also need); [[q199]] pins it
  * with an exact DuckDB oracle: the generated image's dimensions and
  * pixel sum are predictable in closed form, so a hash match proves the
  * decoder extracted REAL header fields and REAL raster samples from
  * real PNG bytes. Audio/video stay header-stub territory (no codecs in
  * the JDK), but share the same plumbing.
  */
object MultimodalOps {

  /** A decoded media record: actual encoded size, actual decoded
    * dimensions/bands, exact band-0 sample sum, payload digest. */
  final case class MediaMeta(
      doc_id: Long, byte_len: Long, width: Long, height: Long,
      channels: Long, px_sum: Long, digest: String)

  /** Real PNG encode/decode via `javax.imageio` — the JDK ships a
    * pure-Java PNG plugin, so this runs in any headless executor. */
  object ImageCodec {

    /** Deterministic w×h grayscale PNG: sample(x, y) = (x + y + seed)
      * mod 256. 8-bit gray PNG is lossless, so the decode side recovers
      * these exact samples — what makes an exact cross-engine oracle
      * possible for a binary codec. */
    def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          raster.setSample(x, y, 0, ((x + y + seed) % 256).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode any image payload the JDK recognizes: (width, height,
      * bands, band-0 sample sum). Undecodable/corrupt payloads yield
      * None — a 100 TB corpus always contains broken files, and a
      * decoder that throws kills the task instead of routing the row to
      * a quarantine side-output. */
    def decodeMeta(payload: Array[Byte]): Option[(Int, Int, Int, Long)] =
      try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))).map { img =>
        val r = img.getRaster
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            sum += r.getSample(x, y, 0)
            x += 1
          }
          y += 1
        }
        (img.getWidth, img.getHeight, r.getNumBands, sum)
      } catch { case _: java.io.IOException => None }
  }

  /** Per-doc deterministic image dimensions (small: tests and oracle
    * stay cheap; the decode path is size-oblivious). */
  private[graft] def dimsOf(docId: Long): (Int, Int) =
    ((docId % 24 + 4).toInt, (docId % 16 + 4).toInt)

  /** Typed batch-decode path: synthesize each doc's PNG payload (the
    * bytes a real pipeline would pull from object storage / a [[q82]]
    * bundle), then REALLY decode it back through `javax.imageio` in the
    * same partition — an executor-distributed encode→decode round trip.
    * Every emitted field comes from the DECODED image, not the
    * generation parameters; a doc whose payload fails to decode fails
    * loudly here (the quarantine form is `flatMap` over
    * [[ImageCodec.decodeMeta]]). */
  def decodeMedia(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        // a JNI/FFI decoder would init once per partition here
        ids.map { id =>
          val (w, h) = dimsOf(id)
          val payload = ImageCodec.encodePng(w, h, id)
          val (dw, dh, bands, pxSum) = ImageCodec.decodeMeta(payload)
            .getOrElse(throw new IllegalStateException(
              s"payload of doc $id did not decode"))
          val digest = java.security.MessageDigest.getInstance("SHA-256")
            .digest(payload).map("%02x".format(_)).mkString
          MediaMeta(id, payload.length.toLong, dw.toLong, dh.toLong,
            bands.toLong, pxSum, digest)
        }
      }
  }

  /** Q199 — the real-decode gate: dimensions and exact pixel sum read
    * from DECODED PNG rasters, hash-checked against the closed-form
    * oracle (the encoder writes sample (x+y+id) mod 256, so DuckDB can
    * predict the sum without ever seeing a PNG byte). PNG byte length
    * and digest are excluded: they pin the JDK encoder's compression
    * choices, not the decode contract. */
  val q199 = Query(
    "q199_png_decode",
    (s, dir) => {
      import s.implicits._
      decodeMedia(s, dir)
        .map(m => (m.doc_id, m.width, m.height, m.channels, m.px_sum))
        .toDF("doc_id", "width", "height", "channels", "px_sum")
        .orderBy("doc_id")
    },
    Some("""SELECT d.doc_id,
           |       CAST(d.doc_id % 24 + 4 AS BIGINT) AS width,
           |       CAST(d.doc_id % 16 + 4 AS BIGINT) AS height,
           |       CAST(1 AS BIGINT) AS channels,
           |       CAST(SUM((x.x + y.y + d.doc_id) % 256) AS BIGINT) AS px_sum
           |FROM documents d,
           |     LATERAL (SELECT unnest(range(0, d.doc_id % 24 + 4)) AS x) x,
           |     LATERAL (SELECT unnest(range(0, d.doc_id % 16 + 4)) AS y) y
           |GROUP BY d.doc_id
           |ORDER BY d.doc_id""".stripMargin)
  )

  /** A resized thumbnail's exact content: dims, sample sum, and an
    * md5 over the comma-joined row-major samples (a digest DuckDB can
    * reproduce without touching a PNG byte). */
  final case class ThumbMeta(
      doc_id: Long, width: Long, height: Long, tw: Long, th: Long,
      thumb_sum: Long, thumb_digest: String)

  /** Q241 — IMAGE RESIZE over really-decoded rasters: each doc's PNG
    * decodes through `javax.imageio`, then a nearest-neighbor 4×4
    * thumbnail samples the DECODED raster (src = ⌊t·dim/4⌋ — the NN
    * mapping every thumbnailer runs, hand-rolled so the rounding
    * convention is pinned rather than inherited from a library's
    * Graphics2D interpolation). Because the encoder's samples are
    * closed-form ((x+y+id) mod 256) and 8-bit gray PNG is lossless,
    * the thumbnail's exact bytes are PREDICTABLE relationally — the
    * one shape of binary-codec operator that can be hash-gated, not
    * just smoke-tested.
    *
    * Scale shape: synthesize→decode→resize runs entirely inside one
    * mapPartitions over the id scan (executor-side, no driver bytes,
    * no shuffle); output is one tiny row per image. At 100 TB this is
    * the thumbnail/preprocess pass of an image-corpus pipeline —
    * embarrassingly parallel, decoder inited once per partition. */
  val q241 = Query(
    "q241_image_resize",
    (s, dir) => {
      import s.implicits._
      val tdim = 4
      Tables.documents(s, dir)
        .select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val (w, h) = dimsOf(id)
            val payload = ImageCodec.encodePng(w, h, id)
            val img = Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload)))
              .getOrElse(throw new IllegalStateException(
                s"payload of doc $id did not decode"))
            val r = img.getRaster
            val samples = for {
              ty <- 0 until tdim
              tx <- 0 until tdim
            } yield r.getSample(tx * img.getWidth / tdim,
              ty * img.getHeight / tdim, 0)
            val digest = java.security.MessageDigest.getInstance("MD5")
              .digest(samples.mkString(",").getBytes("UTF-8"))
              .map("%02x".format(_)).mkString
            ThumbMeta(id, img.getWidth.toLong, img.getHeight.toLong,
              tdim.toLong, tdim.toLong, samples.map(_.toLong).sum, digest)
          }
        }
        .toDF()
        .orderBy("doc_id")
    },
    Some("""WITH px AS (
           |  SELECT d.doc_id,
           |         d.doc_id % 24 + 4 AS w, d.doc_id % 16 + 4 AS h,
           |         ty.ty, tx.tx,
           |         ((tx.tx * (d.doc_id % 24 + 4)) // 4
           |          + (ty.ty * (d.doc_id % 16 + 4)) // 4
           |          + d.doc_id) % 256 AS s
           |  FROM documents d,
           |       LATERAL (SELECT unnest(range(0, 4)) AS ty) ty,
           |       LATERAL (SELECT unnest(range(0, 4)) AS tx) tx)
           |SELECT doc_id,
           |       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           |       CAST(4 AS BIGINT) AS tw, CAST(4 AS BIGINT) AS th,
           |       CAST(SUM(s) AS BIGINT) AS thumb_sum,
           |       md5(string_agg(s, ',' ORDER BY ty, tx)) AS thumb_digest
           |FROM px
           |GROUP BY doc_id, w, h
           |ORDER BY doc_id""".stripMargin)
  )

  /** Q36 — typed-metadata extraction over opaque binary payloads,
    * columnar formulation (binary cast + octet_length + sha2 + derived
    * synthetic dimensions), hash-checked against DuckDB. This is the
    * metadata-column path (stays inside WholeStageCodegen, no decoder);
    * the REAL decode path is [[q199]]. */
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

  /** A decoded audio record: byte length of the WAV container, decoded
    * format fields, exact sample sum, frame count. */
  final case class AudioMeta(
      doc_id: Long, byte_len: Long, sample_rate: Long, channels: Long,
      bits: Long, n_samples: Long, smp_sum: Long)

  /** Real WAV/PCM encode/decode via `javax.sound.sampled` — the JDK
    * ships a pure-Java WAVE reader/writer, so this runs headless on any
    * executor, q199's PNG story for the audio modality. */
  object AudioCodec {

    /** Deterministic mono 16-bit PCM WAV: sample(i) =
      * ((i·31 + seed·17) mod 65536) − 32768 — exactly recoverable
      * (PCM is lossless), so the decode side hash-checks against a
      * closed-form oracle that never sees a WAV byte. */
    def encodeWav(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
      val pcm = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) {
        val v = (((i.toLong * 31 + seed * 17) % 65536) - 32768).toInt
        pcm(2 * i) = (v & 0xff).toByte // little-endian signed 16-bit
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode any WAV payload the JDK recognizes: (sampleRate, channels,
      * bits, frames, signed-sample sum over all channels). Corrupt or
      * non-audio payloads yield None — quarantine, never a task kill. */
    def decodeMeta(payload: Array[Byte])
        : Option[(Int, Int, Int, Long, Long)] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
        val bytes = ais.readAllBytes()
        var sum = 0L
        var i = 0
        while (i + 1 < bytes.length) {
          sum += ((bytes(i) & 0xff) | (bytes(i + 1).toInt << 8)).toShort
          i += 2
        }
        Some((fmt.getSampleRate.toInt, fmt.getChannels,
          fmt.getSampleSizeInBits, ais.getFrameLength, sum))
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
        case _: IllegalArgumentException => None
      }
  }

  /** Per-doc deterministic sample count (small; the decode path is
    * length-oblivious). */
  private[graft] def samplesOf(docId: Long): Int = (docId % 400 + 50).toInt

  /** Executor-distributed WAV encode→decode round trip, [[decodeMedia]]
    * for the audio modality: every emitted field comes from the DECODED
    * container (header fields from the parsed RIFF/fmt chunks, the sum
    * from the PCM frames), never from generation parameters. */
  def decodeAudio(spark: SparkSession, dir: String): Dataset[AudioMeta] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val payload = AudioCodec.encodeWav(samplesOf(id), 8000, id)
          val (rate, ch, bits, frames, sum) = AudioCodec.decodeMeta(payload)
            .getOrElse(throw new IllegalStateException(
              s"payload of doc $id did not decode"))
          AudioMeta(id, payload.length.toLong, rate.toLong, ch.toLong,
            bits.toLong, frames, sum)
        }
      }
  }

  /** Q209 — the real audio-decode gate: format fields and the exact
    * signed-sample sum read from DECODED WAV payloads, hash-checked
    * against the closed-form oracle (the encoder writes sample
    * (i·31 + id·17) mod 65536 − 32768, so DuckDB predicts the sum
    * without a WAV byte in sight). Container byte length is excluded —
    * it pins the JDK writer's header layout, not the decode contract. */
  val q209 = Query(
    "q209_wav_decode",
    (s, dir) => {
      import s.implicits._
      decodeAudio(s, dir)
        .map(m => (m.doc_id, m.sample_rate, m.channels, m.bits,
          m.n_samples, m.smp_sum))
        .toDF("doc_id", "sample_rate", "channels", "bits", "n_samples",
          "smp_sum")
        .orderBy("doc_id")
    },
    Some("""SELECT d.doc_id,
           |       CAST(8000 AS BIGINT) AS sample_rate,
           |       CAST(1 AS BIGINT) AS channels,
           |       CAST(16 AS BIGINT) AS bits,
           |       CAST(d.doc_id % 400 + 50 AS BIGINT) AS n_samples,
           |       CAST(SUM((i.i * 31 + d.doc_id * 17) % 65536 - 32768)
           |         AS BIGINT) AS smp_sum
           |FROM documents d,
           |     LATERAL (SELECT unnest(range(0, d.doc_id % 400 + 50)) AS i) i
           |GROUP BY d.doc_id
           |ORDER BY d.doc_id""".stripMargin)
  )

  /** Decode a 16-bit little-endian WAV to its raw samples — the PCM
    * feed for window-level feature extraction. Corrupt payloads yield
    * None (quarantine, never a task kill). */
  private[graft] def decodeSamples(payload: Array[Byte])
      : Option[Array[Short]] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
      val bytes = ais.readAllBytes()
      val out = new Array[Short](bytes.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1).toInt << 8)).toShort
        i += 1
      }
      Some(out)
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
      case _: IllegalArgumentException => None
    }

  /** Q217 — WINDOWED audio features over real WAV decode: each
    * payload's PCM stream splits into fixed 64-sample windows and every
    * window folds to (Σ|s|, max|s|) — the energy/peak envelope a
    * speech-quality or silence-trim pass runs before transcription.
    * The decode and the fold both happen EXECUTOR-side inside one
    * `mapPartitions` pass (per-task state is one window's
    * accumulators, O(1) memory regardless of clip length); the oracle
    * recomputes every window closed-form from the synth waveform, so a
    * hash match proves the real decoder + the window fold bit-exact.
    * Integers end to end — no float envelope to drift cross-engine. */
  val q217 = Query(
    "q217_audio_windows",
    (s, dir) => {
      import s.implicits._
      val W = 64
      Tables.documents(s, dir)
        .select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val payload = AudioCodec.encodeWav(samplesOf(id), 8000, id)
            val smp = decodeSamples(payload).getOrElse(
              throw new IllegalStateException(s"doc $id did not decode"))
            var win = 0; var i = 0
            var nWin = 0L; var peak = 0L; var loudSum = 0L; var loudWin = 0L
            while (i < smp.length) {
              val end = math.min(i + W, smp.length)
              var wsum = 0L; var wpeak = 0L
              var j = i
              while (j < end) {
                val a = math.abs(smp(j).toLong)
                wsum += a; if (a > wpeak) wpeak = a
                j += 1
              }
              nWin += 1
              if (wpeak > peak) peak = wpeak
              if (wsum > loudSum) { loudSum = wsum; loudWin = win.toLong }
              win += 1; i = end
            }
            (id, nWin, peak, loudSum, loudWin)
          }
        }
        .toDF("doc_id", "n_windows", "peak", "loud_sum", "loud_win")
        .orderBy("doc_id")
    },
    Some("""WITH s AS (
           |  SELECT d.doc_id, i.i AS i,
           |         (i.i * 31 + d.doc_id * 17) % 65536 - 32768 AS v
           |  FROM documents d,
           |       LATERAL (SELECT unnest(range(0, d.doc_id % 400 + 50)) AS i) i),
           |w AS (
           |  SELECT doc_id, i // 64 AS win,
           |         SUM(ABS(v)) AS wsum, MAX(ABS(v)) AS wpeak
           |  FROM s GROUP BY doc_id, i // 64),
           |a AS (
           |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
           |         CAST(MAX(wpeak) AS BIGINT) AS peak,
           |         CAST(MAX(wsum) AS BIGINT) AS loud_sum
           |  FROM w GROUP BY doc_id)
           |SELECT a.doc_id, a.n_windows, a.peak, a.loud_sum,
           |       CAST(MIN(w.win) AS BIGINT) AS loud_win
           |FROM a JOIN w ON a.doc_id = w.doc_id AND w.wsum = a.loud_sum
           |GROUP BY a.doc_id, a.n_windows, a.peak, a.loud_sum
           |ORDER BY a.doc_id""".stripMargin)
  )

  val all: Seq[Query] = Seq(q36, q63, q64, q82, q199, q209, q217, q241)
}
