package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.HashImpl

/** Multimodal column plumbing (SURVEY.md §2 P13): media payloads ride as
  * opaque `binary` columns next to typed metadata, and feature extraction
  * runs as partition-local batch decode. The real Spark-side machinery —
  * schema, encoders, batch shape, partition preservation — is genuine;
  * only the codec call is stubbed (this container ships no image/audio
  * libs), clearly marked below.
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

  /** === STUB DECODE ===
    * A real deployment decodes the payload with an image/audio codec
    * (per-batch, vectorized — the JVM analogue of a pandas-batched UDF).
    * Deterministic fake: feature[i] = unit-scaled bits of
    * fnv64(payload ++ [i]). Same payload → same features, any executor. */
  private def decodeBatch(batch: Seq[MediaItem], dim: Int): Seq[MediaFeatures] =
    batch.map { m =>
      val f = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        val h = HashImpl.fnv64(m.payload :+ i.toByte)
        f(i) = (h.toDouble / 9.223372036854776e18).toFloat
        i += 1
      }
      MediaFeatures(m.id, m.modality, dim, f)
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
