package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.HashImpl

/** Multimodal column plumbing (SURVEY.md §2 P13): media payloads ride as
  * opaque `binary` columns next to typed metadata, and feature extraction
  * runs as partition-local batch decode. The Spark-side machinery —
  * schema, encoders, batch shape, partition preservation — is genuine;
  * the IMAGE modality decodes for real through javax.imageio (PNG/JPEG/
  * GIF/BMP ship in the JDK) and the AUDIO modality through
  * javax.sound.sampled (WAV/PCM and AIFF ship in the JDK); only video
  * remains stubbed (the JDK bundles no video codec), clearly marked
  * below.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, sampleRateHz: Int)
  case class MediaItem(id: Long, modality: String, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(id: Long, modality: String, dim: Int, features: Array[Float])

  /** Wrap the documents table as a media table: payload = UTF-8 bytes
    * standing in for encoded image/audio/video frames. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        lit(16000).as("sampleRateHz")).as("meta"))

  /** REAL image decode via javax.imageio (in the JDK — no external
    * codec needed for PNG/JPEG/GIF/BMP). Features: [width, height,
    * mean R, mean G, mean B (unit-scaled), 4-bin luminance histogram],
    * zero-padded/truncated to `dim`. Returns None when the payload is
    * not a decodable image (caller falls back to the stub so a corrupt
    * file degrades instead of failing the job — the triage pass P17
    * flags those upstream). */
  private[graft] def decodeImage(payload: Array[Byte], dim: Int): Option[Array[Float]] = {
    // Try, not a null check: ImageIO.read returns null only for
    // UNRECOGNIZED formats — a payload with valid PNG/JPEG magic but a
    // corrupt body THROWS IOException, which must also degrade to the
    // stub instead of failing the task.
    val img = scala.util.Try(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      .toOption.flatMap(Option(_)).orNull
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      val lum = new Array[Long](4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
          sr += r; sg += g; sb += b
          lum(math.min(3, ((r * 299 + g * 587 + b * 114) / 1000) / 64)) += 1L
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      val base = Array[Float](w.toFloat, h.toFloat,
        sr / n / 255f, sg / n / 255f, sb / n / 255f,
        lum(0) / n, lum(1) / n, lum(2) / n, lum(3) / n)
      Some(java.util.Arrays.copyOf(base, dim))
    }
  }

  /** REAL audio decode via javax.sound.sampled (in the JDK — WAV/PCM
    * and AIFF need no external codec). Features: [sample rate (Hz),
    * channels, frame count, duration (s), RMS, peak, zero-crossing
    * rate, mean] over unit-scaled 16-bit samples, zero-padded/truncated
    * to `dim`. Returns None when the payload is not decodable audio
    * (wrong magic, corrupt body, or a non-16-bit encoding) — the caller
    * falls back to the stub so a bad file degrades instead of failing
    * the job, same contract as [[decodeImage]]. */
  private[graft] def decodeAudio(payload: Array[Byte], dim: Int): Option[Array[Float]] =
    scala.util.Try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 &&
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          s"only 16-bit signed PCM decoded, got $fmt")
        val bytes = in.readAllBytes()
        val n = bytes.length / 2
        var i = 0
        var sum = 0.0; var sumSq = 0.0; var peak = 0.0; var zc = 0L; var prev = 0
        while (i < n) {
          val lo = if (fmt.isBigEndian) bytes(2 * i + 1) else bytes(2 * i)
          val hi = if (fmt.isBigEndian) bytes(2 * i) else bytes(2 * i + 1)
          val s = ((hi << 8) | (lo & 0xff)).toShort.toInt
          val v = s / 32768.0
          sum += v; sumSq += v * v
          if (math.abs(v) > peak) peak = math.abs(v)
          if (i > 0 && ((s >= 0) != (prev >= 0))) zc += 1
          prev = s
          i += 1
        }
        val frames = n / math.max(1, fmt.getChannels)
        val base = Array[Float](
          fmt.getSampleRate,
          fmt.getChannels.toFloat,
          frames.toFloat,
          (frames / fmt.getSampleRate.toDouble).toFloat,
          if (n == 0) 0f else math.sqrt(sumSq / n).toFloat,
          peak.toFloat,
          if (n == 0) 0f else (zc.toDouble / n).toFloat,
          if (n == 0) 0f else (sum / n).toFloat)
        java.util.Arrays.copyOf(base, dim)
      } finally in.close()
    }.toOption

  /** Deterministic tiny WAV: `nSamples` of 16-bit mono PCM noise derived
    * from splitmix64(seed, i), written through the REAL WAVE encoder —
    * gives every 'audio' row a genuine decodable payload (the audio twin
    * of [[pngPayload]]). */
  def wavPayload(seed: Long, nSamples: Int = 160, rateHz: Int = 16000): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (HashImpl.splitmix64(seed * 1000003L + i) % 32768L).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rateHz.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** === STUB DECODE (video only) ===
    * A real deployment decodes video with a codec library (per-batch,
    * vectorized — the JVM analogue of a pandas-batched UDF); the JDK
    * bundles none. Deterministic fake: feature[i] = unit-scaled bits of
    * fnv64(payload ++ [i]). Same payload → same features, any executor.
    * Also the degradation target for corrupt image/audio payloads. */
  private def stubFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val f = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val h = HashImpl.fnv64(payload :+ i.toByte)
      f(i) = (h.toDouble / 9.223372036854776e18).toFloat
      i += 1
    }
    f
  }

  private def decodeBatch(batch: Seq[MediaItem], dim: Int): Seq[MediaFeatures] =
    batch.map { m =>
      val feats = m.modality match {
        case "image" => decodeImage(m.payload, dim).getOrElse(stubFeatures(m.payload, dim))
        case "audio" => decodeAudio(m.payload, dim).getOrElse(stubFeatures(m.payload, dim))
        case _ => stubFeatures(m.payload, dim) // STUB: no video codec in the JDK
      }
      MediaFeatures(m.id, m.modality, dim, feats)
    }

  /** Deterministic tiny PNG: a w×h image whose pixels derive from
    * splitmix64(seed, x, y), encoded through the REAL PNG encoder —
    * gives every 'image' row a genuine decodable payload. */
  def pngPayload(seed: Long, w: Int = 4, h: Int = 4): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (HashImpl.splitmix64(seed * 31L + y * w + x) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Media table whose image rows carry REAL PNG payloads and audio rows
    * REAL WAV payloads (both encoded on the executors, partition-local);
    * video keeps the synthetic bytes its stub consumes. */
  def mediaWithRealImages(spark: SparkSession, docs: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    mediaFromDocuments(docs).as[MediaItem].mapPartitions(_.map { m =>
      m.modality match {
        case "image" => m.copy(payload = pngPayload(m.id))
        case "audio" => m.copy(payload = wavPayload(m.id))
        case _ => m
      }
    })
  }

  /** Partition-local batched feature extraction. `mapPartitions` +
    * `grouped(batchSize)` mirrors the arrow-batch shape of a vectorized
    * python UDF: the decoder amortizes per-batch setup, partitioning is
    * untouched (no shuffle), and memory is bounded by batchSize. */
  def extractFeatures(media: Dataset[MediaItem], dim: Int = 16,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it => it.grouped(batchSize).flatMap(b => decodeBatch(b, dim)))
  }

  /** End-to-end: documents → media table → features, as a DataFrame. */
  def documentFeatures(spark: SparkSession, docs: DataFrame, dim: Int = 16): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaFromDocuments(docs).as[MediaItem], dim).toDF()
  }

  // ---- codec-free byte-level triage (REAL, not stubbed) ---------------

  private val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
  private val wavMagic = "RIFF0000WAVE".getBytes("ISO-8859-1") // RIFF<size>WAVE

  /** Media table whose payloads carry real container headers per
    * modality (image→PNG, audio→RIFF/WAVE, video→headerless), so the
    * sniffing path is exercised against genuine magic numbers. */
  def mediaWithHeaders(docs: DataFrame): DataFrame =
    mediaFromDocuments(docs).withColumn("payload",
      when(col("modality") === "image", concat(lit(pngMagic), col("payload")))
        .when(col("modality") === "audio", concat(lit(wavMagic), col("payload")))
        .otherwise(col("payload")))

  /** Byte-level features every 100 TB triage pass wants BEFORE decoding:
    * container format (magic numbers), Shannon entropy (flags already-
    * compressed/encrypted payloads), size, and a coarse histogram
    * summary — all codegen expressions at scan speed. */
  def binaryFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    mediaWithHeaders(docs)
      .select(col("id"), col("modality"),
        call_function("sniff_format", col("payload")).as("format"),
        round(call_function("byte_entropy", col("payload")), 4).as("entropy"),
        length(col("payload")).cast("long").as("n_bytes"),
        round(element_at(call_function("byte_histogram16", col("payload")), 7), 4)
          .as("hist_ascii_6x")) // bin 6 = 0x60..0x6f, lowercase-letter-heavy
      .orderBy("id")
  }

  /** Frame-sampling plan (the video path of the multimodal brief):
    * decide WHICH frames to decode before any codec runs — uniform
    * stride over the frame count derived from payload duration
    * (synthetic: 1 byte ≡ 1 ms). Pure integer arithmetic + explode, so
    * the selection plan is oracle-exact even though decode itself is
    * stubbed; a real pipeline feeds these (id, frame_idx) pairs to the
    * batched decoder in [[extractFeatures]]. All division is integer
    * DIV to stay engine-portable. */
  def frameSamplePlan(docs: DataFrame, k: Int = 8, fps: Int = 25): DataFrame =
    mediaFromDocuments(docs)
      .filter(col("modality") === "video")
      .select(col("id"), length(col("payload")).cast("long").as("dur_ms"))
      .withColumn("total_frames",
        greatest(expr(s"dur_ms * $fps DIV 1000"), lit(1L)))
      .withColumn("step", greatest(expr(s"total_frames DIV $k"), lit(1L)))
      .select(col("id"), col("total_frames"),
        explode(expr("sequence(CAST(0 AS BIGINT), total_frames - 1, step)")).as("frame_idx"))
      .withColumn("ts_ms", expr(s"frame_idx * 1000 DIV $fps"))

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // rows-only: entropy/histogram have no DuckDB per-row equivalent;
    // MultimodalSpec pins exact values on known payloads.
    "mm_binary_features" -> ((spark, dir) => {
      binaryFeatures(spark, graft.Tables(spark, dir).documents.filter(col("doc_id") < 500))
    }),
    "mm_frame_sample" -> ((spark, dir) => {
      frameSamplePlan(graft.Tables(spark, dir).documents.filter(col("doc_id") < 500))
        .orderBy("id", "frame_idx")
    }),
    // P13 real path: encode genuine PNGs on the executors, decode them
    // back through javax.imageio, extract pixel statistics. PNG encode/
    // decode is not SQL-expressible → rows-only; PipelineSpec pins the
    // statistics of a hand-built 2×2 image. lum_total must be 1.0 on
    // every row (the luminance histogram is a distribution).
    "mm_image_decode" -> ((spark, dir) => {
      val docs = graft.Tables(spark, dir).documents.filter(col("doc_id") < 300)
      extractFeatures(mediaWithRealImages(spark, docs), dim = 9).toDF()
        .filter(col("modality") === "image")
        .select(col("id"),
          element_at(col("features"), 1).cast("long").as("w"),
          element_at(col("features"), 2).cast("long").as("h"),
          round(element_at(col("features"), 3), 4).as("mean_r"),
          round(element_at(col("features"), 4), 4).as("mean_g"),
          round(element_at(col("features"), 5), 4).as("mean_b"),
          round(element_at(col("features"), 6) + element_at(col("features"), 7) +
            element_at(col("features"), 8) + element_at(col("features"), 9), 2).as("lum_total"))
        .orderBy("id")
    }),
    // P13 audio path: encode genuine WAV/PCM on the executors, decode
    // back through javax.sound.sampled, extract signal statistics.
    // WAVE encode/decode is not SQL-expressible → rows-only;
    // PipelineSpec pins the statistics of a hand-built 4-sample WAV.
    "mm_audio_decode" -> ((spark, dir) => {
      val docs = graft.Tables(spark, dir).documents.filter(col("doc_id") < 300)
      extractFeatures(mediaWithRealImages(spark, docs), dim = 8).toDF()
        .filter(col("modality") === "audio")
        .select(col("id"),
          element_at(col("features"), 1).cast("long").as("rate_hz"),
          element_at(col("features"), 2).cast("long").as("channels"),
          element_at(col("features"), 3).cast("long").as("n_frames"),
          round(element_at(col("features"), 5), 4).as("rms"),
          round(element_at(col("features"), 6), 4).as("peak"),
          round(element_at(col("features"), 7), 4).as("zcr"))
        .orderBy("id")
    }),
  )

  val oracles: Map[String, String] = Map(
    // payload is the UTF-8 text bytes → strlen (DuckDB byte length)
    // mirrors length(binary); modality 'video' ⇔ doc_id % 3 = 2.
    "mm_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id AS id, CAST(strlen(text) AS BIGINT) AS dur_ms
        |  FROM documents WHERE doc_id < 500 AND doc_id % 3 = 2),
        |f AS (
        |  SELECT id, greatest(dur_ms * 25 // 1000, 1) AS total_frames,
        |         greatest(greatest(dur_ms * 25 // 1000, 1) // 8, 1) AS step
        |  FROM v),
        |g AS (
        |  SELECT id, total_frames,
        |         unnest(generate_series(0, total_frames - 1, step)) AS frame_idx
        |  FROM f)
        |SELECT id, total_frames, frame_idx, frame_idx * 1000 // 25 AS ts_ms
        |FROM g ORDER BY id, frame_idx""".stripMargin,
  )
}
