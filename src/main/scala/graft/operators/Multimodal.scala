package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing (SURVEY §2.2 #35): image/audio/video payloads
 * ride through the engine as opaque `binary` columns with a typed metadata
 * struct. All Spark-side mechanics — schema, partition-sized batching,
 * feature extraction shape — are real; only the codec itself is a stub
 * (the container ships no image/audio libraries), kept behind
 * [[Multimodal.decoder]] so a production build swaps in a real decoder
 * without touching the pipeline.
 */
object Multimodal {

  /** Typed media row: what a decode stage consumes. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Typed features: what a decode stage produces. */
  final case class MediaFeatures(
      doc_id: Long, bytes: Long, width: Int, height: Int, brightness: Double)

  /**
   * Attach a binary payload + typed metadata to each document. In
   * production the payload comes from the source (e.g. a parquet binary
   * column of JPEG bytes); here the UTF-8 bytes of `text` stand in — the
   * engine treats them as opaque either way.
   */
  def attachPayload(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))
      .withColumn("media_meta", struct(
        length(col("payload")).cast("long").as("bytes"),
        lit("application/octet-stream").as("content_type"),
        md5(col("payload")).as("checksum")))

  /**
   * The default decoder: REAL container-header parsing first — PNG IHDR,
   * JPEG SOF segment walk, GIF logical screen, BMP InfoHeader, shared
   * with the codegen [[graft.plans.ImageDims]] expression — with a
   * deterministic stub fallback for payloads matching no magic (this
   * container ships no pixel codec, so brightness stays a byte-mean
   * proxy either way). Production swaps in a full codec
   * (`javax.imageio`, ffmpeg bindings, ...) by passing it to
   * [[decodeFeatures]] — the decoder is a parameter (serialized with
   * the closure), NOT mutable global state, because a driver-side `var`
   * would never reach executor JVMs.
   */
  val defaultDecoder: MediaRow => MediaFeatures = { row =>
    val bytes = row.payload
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
    val (w, h) = graft.plans.ImageDims.parse(bytes) match {
      case Some((_, pw, ph)) => (pw, ph)
      case None => // stub: deterministic fake dims for opaque payloads
        (64 + (math.abs(bytes.length * 2654435761L) % 1024).toInt,
          64 + (math.abs(bytes.length * 40503L) % 768).toInt)
    }
    MediaFeatures(
      doc_id = row.doc_id,
      bytes = bytes.length.toLong,
      width = w,
      height = h,
      brightness = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length)
  }

  /**
   * Column-level header decode for declarative pipelines: a
   * `struct(format, width, height)` column (NULL when no container
   * magic matches) via the codegen [[graft.plans.ImageDims]]
   * expression — metadata extraction with no mapPartitions detour and
   * no codec library.
   */
  def imageDims(spark: SparkSession, payload: Column): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function(graft.plans.GraftFunctions.imageDimsName, payload)
  }

  /** Audio container metadata (WAV chunk walk, FLAC STREAMINFO bit
   *  unpack) as a codegen struct column — see [[graft.plans.AudioMeta]]. */
  def audioMeta(spark: SparkSession, payload: Column): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function(graft.plans.GraftFunctions.audioMetaName, payload)
  }

  /** Video container metadata (MP4/ISO-BMFF box walk: ftyp brand, mvhd
   *  timescale/duration, trak count) as a codegen struct column — see
   *  [[graft.plans.VideoMeta]]. */
  def videoMeta(spark: SparkSession, payload: Column): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function(graft.plans.GraftFunctions.videoMetaName, payload)
  }

  /**
   * Frame-sampling plan over video payloads: one row per sample
   * instant — every `strideMs` milliseconds of PARSED media time
   * (mvhd duration/timescale via [[videoMeta]]'s box walk), capped at
   * `maxFrames` per video. This is the Spark-side plumbing of a frame
   * extraction pipeline — schema, bounded per-row fan-out, sample
   * arithmetic — with the pixel decode itself stubbed out exactly as
   * [[decodeFeatures]] documents (no codec ships here; a production
   * build maps these (payload, ts_ms) rows through a per-partition
   * decoder). Unparseable payloads drop — they have no clock to
   * sample.
   *
   * All arithmetic is EXACT integer: media-time milliseconds floor to
   * `duration·1000 DIV timescale`, instants to `i·strideMs` for
   * i = 0..min(dur_ms DIV strideMs, maxFrames−1) — replayable in any
   * engine, no floats. The explode is bounded by `maxFrames` (a
   * corrupt duration cannot fan out a row unboundedly); zero-length
   * videos still emit their t=0 frame.
   *
   * Scale: pure per-row projection + bounded explode, zero shuffle;
   * the payload column is never duplicated across sample rows (only
   * id + instant survive the explode). No null-guard FILTER on the
   * parsed struct (the predicate would push below the projection and
   * re-run the box walk per row — the q30 totality rule): instead the
   * sequence bound goes NULL for unparseable payloads — `least` alone
   * would SKIP the null, not propagate it — and exploding a NULL
   * array drops the row.
   */
  def frameSampleInstants(
      spark: SparkSession, df: DataFrame, id: String, payloadCol: String,
      strideMs: Long = 1000L, maxFrames: Int = 12): DataFrame = {
    require(strideMs > 0 && maxFrames >= 1,
      "frameSampleInstants needs strideMs > 0 and maxFrames >= 1")
    val meta = videoMeta(spark, col(payloadCol))
    df.select(col(id), meta.as("__gmeta"))
      .select(col(id),
        // guard duration*1000 against Long overflow: an adversarial
        // (but parseable) u64 duration would wrap NEGATIVE, and
        // sequence(0, negative) THROWS — an overflowing clock is
        // treated as unparseable (NULL → dropped at the explode)
        when(col("__gmeta.duration") <= lit(Long.MaxValue / 1000L),
          col("__gmeta.duration") * lit(1000L)).as("__gdurticks"),
        col("__gmeta.timescale").as("__gts"))
      .select(col(id), expr("__gdurticks DIV __gts").as("__gdurms"))
      .select(col(id), explode(sequence(lit(0L),
        when(col("__gdurms").isNotNull,
          least(expr(s"__gdurms DIV ${strideMs}L"), lit(maxFrames - 1L)))))
        .as("frame_idx"))
      .withColumn("ts_ms", col("frame_idx") * strideMs)
  }

  /**
   * Decode stage: per-partition batch iteration (`mapPartitions`), the
   * correct shape for codec work — the decoder amortizes setup once per
   * partition and streams rows without collecting. This is the one place
   * graft drops below the DataFrame API, as SURVEY §4 allows for genuine
   * per-partition imperative logic.
   */
  def decodeFeatures(
      spark: SparkSession, docs: DataFrame, textCol: String, idCol: String,
      decode: MediaRow => MediaFeatures = defaultDecoder): Dataset[MediaFeatures] = {
    val media = docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).cast("binary").as("payload"))
      .as(Encoders.product[MediaRow])
    media.mapPartitions { rows =>
      // per-partition codec setup would happen here
      rows.map(decode)
    }(Encoders.product[MediaFeatures])
  }

  /**
   * Resize stage: pure metadata arithmetic over decoded features — fits
   * the longest edge to `maxEdge` preserving aspect ratio. In production
   * the pixel resample runs in the same mapPartitions as the decoder;
   * the bookkeeping here (and its schema) is the real contract.
   */
  def resizeMeta(features: DataFrame, maxEdge: Int): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val scale = when(longest > maxEdge, lit(maxEdge).cast("double") / longest)
      .otherwise(lit(1.0))
    features
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
      .withColumn("resized", scale < 1.0)
  }

  /**
   * Frame-sampling stage for video-like payloads: every `stride`-th
   * fixed-size chunk of the binary becomes a (frame_idx, frame) row —
   * the explode keeps sampling distributed and shuffle-free. With a real
   * container format the chunker is the codec's keyframe index; the
   * deterministic byte chunker stands in for it.
   */
  def sampleFrames(media: DataFrame, idCol: String, payloadCol: String,
                   frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = floor(length(col(payloadCol)) / frameBytes).cast("int")
    media.select(
        col(idCol),
        posexplode(transform(
          sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)),
          i => substring(col(payloadCol), i * frameBytes + 1, lit(frameBytes))))
          .as(Seq("frame_idx", "frame")))
      .filter(length(col("frame")) === frameBytes)
  }
}
