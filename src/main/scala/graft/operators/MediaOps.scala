package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns with a typed metadata struct. The
  * Spark-side mechanics — schema, per-partition batched processing, feature
  * schema — are real; the actual codec call is stubbed with a deterministic
  * fake (this environment ships no image/audio libraries), clearly marked
  * below.
  */
object MediaOps {

  val featureDim = 8

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType))))))

  /** Wrap any keyed text frame as a media frame (payload = utf-8 bytes) —
    * stands in for reading real image/audio blobs.
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(lit("txt").as("format"),
        octet_length(col(textCol)).cast("long").as("n_bytes")).as("meta"))

  /** ==== STUB ====
    * A real implementation decodes the payload (JPEG decode, audio
    * resample, video frame sampling) behind the [[MediaDecoder]] seam.
    * With no codec libraries in this environment, the default
    * [[StrideDecoder]]'s "decoded features" are a deterministic function
    * of the payload's md5, so plumbing is testable end-to-end and
    * reproducible by external oracles.
    */
  def fakeFeatures(md5hex: String): Array[Int] =
    (0 until featureDim).map(j => md5hex.charAt(j).toInt).toArray

  private[operators] def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** Columnar formulation of the same stub (codegen'd; used as the oracle
    * for the batched path).
    */
  def featureColumns(df: DataFrame): DataFrame =
    df.withColumn("features",
        transform(sequence(lit(1), lit(featureDim)),
          j => ascii(substr(md5(col("payload")), j, lit(1))).cast("int")))
      .select(col("media_id"), col("meta.format").as("format"),
        col("meta.n_bytes").as("n_bytes"), col("features"))

  /** Frame sampling over media payloads: one payload row fans out into its
    * sampled frames — frame k at timestamp `k · everyMs`, covering the
    * timeline (`n_frames = ceil(duration / everyMs)`, so the last frame
    * starts strictly inside the payload). The frame content is a bounded
    * byte slice of the payload at the timestamp's byte offset (tail frames
    * run shorter), carried both raw (`frame`, the bytes a downstream
    * decoder consumes) and as an md5 digest (the compact join/dedup key).
    *
    * ==== STUB boundary ==== duration and byte offsets derive linearly
    * from `meta.n_bytes` at `bytesPerMs` — the contract a real container
    * parser (MP4 stbl, Matroska cues) would supply per keyframe; the
    * SLICING/fan-out plumbing (schema, explode shape, offsets, ceilings)
    * is the real, tested part, and byte-true for any payload.
    *
    * Scale shape: zero exchanges — `sequence` + `explode` is a narrow
    * codegen'd map, so frame extraction scales with input splits and
    * never reshuffles payload bytes. Fan-out is fail-fast bounded by
    * `maxFrames` (a metadata bug must raise, not OOM-explode a task —
    * the IntervalJoin ceiling stance). Zero-duration payloads emit no
    * frames.
    */
  def sampleFrames(media: DataFrame, everyMs: Long = 250,
                   frameBytes: Int = 16, bytesPerMs: Long = 1,
                   maxFrames: Int = 10000,
                   decoder: MediaDecoder = StrideDecoder): DataFrame = {
    require(everyMs >= 1 && frameBytes >= 1 && bytesPerMs >= 1 && maxFrames >= 1)
    // a foreign codec decodes frames in the batched row path; the default
    // stride decoder has a bit-identical codegen'd Column spelling below
    // (differential in MediaDecoderSpec), which keeps the catalog row on
    // the zero-exchange whole-stage-codegen plan
    if (!(decoder eq StrideDecoder))
      return sampleFramesRows(media, everyMs, frameBytes, bytesPerMs,
        maxFrames, decoder)
    // integer `div` throughout — `/` on longs is floating-point in Spark
    // (the Tables.normalizeTs lesson) and a double offset would corrupt
    // byte positions on large payloads
    val dur = expr(s"meta.n_bytes div $bytesPerMs") // duration in ms
    media
      .withColumn("_dur", dur)
      .withColumn("n_frames",
        when(col("_dur") <= 0L, lit(0L))
          .when(col("_dur") > everyMs * maxFrames.toLong, raise_error(concat(
            lit(s"sampleFrames: payload fans out past maxFrames=$maxFrames: media_id="),
            col("media_id").cast("string"))))
          .otherwise(expr(s"(_dur + ${everyMs - 1}) div $everyMs")))
      .filter(col("n_frames") >= 1L)
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1L, lit(1L))).as("frame_idx"),
        col("payload"))
      .withColumn("ts_ms", col("frame_idx") * everyMs)
      .withColumn("frame", col("payload").substr(
        (col("ts_ms") * bytesPerMs + 1L).cast("int"), lit(frameBytes)))
      .withColumn("frame_digest", md5(col("frame")))
      .select("media_id", "frame_idx", "ts_ms", "frame", "frame_digest",
        "n_frames")
  }

  /** The decoder-generic row path behind [[sampleFrames]]: identical
    * timeline contract (duration from metadata, `ceil(dur / everyMs)`
    * frames, fail-fast maxFrames, zero-duration payloads emit nothing),
    * with the frame CONTENT supplied by `decoder.frame` — still a narrow
    * per-partition map, no exchange.
    */
  private[operators] def sampleFramesRows(media: DataFrame, everyMs: Long,
      frameBytes: Int, bytesPerMs: Long, maxFrames: Int,
      decoder: MediaDecoder): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", LongType),
      StructField("ts_ms", LongType),
      StructField("frame", BinaryType),
      StructField("frame_digest", StringType),
      StructField("n_frames", LongType)))
    val projected = Spread(media.select(col("media_id"), col("payload"),
      col("meta.n_bytes").as("n_bytes")))
    projected.mapPartitions { it: Iterator[Row] =>
      it.flatMap { r =>
        val dur = r.getAs[Long]("n_bytes") / bytesPerMs
        if (dur <= 0L) Iterator.empty
        else if (dur > everyMs * maxFrames)
          throw new IllegalStateException(
            s"sampleFrames: payload fans out past maxFrames=$maxFrames: " +
              s"media_id=${r.getAs[Long]("media_id")}")
        else {
          val nFrames = (dur + everyMs - 1) / everyMs
          val payload = r.getAs[Array[Byte]]("payload")
          val id = r.getAs[Long]("media_id")
          (0L until nFrames).iterator.map { fi =>
            val ts = fi * everyMs
            val fr = decoder.frame(payload, ts * bytesPerMs, frameBytes)
            Row(id, fi, ts, fr, md5Hex(fr), nFrames)
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** The production-shaped path: process payloads in bounded batches per
    * partition (the shape a vectorized codec / model runtime needs), emit
    * one feature row per media item. No shuffle: a narrow mapPartitions.
    */
  def decodeFeaturesBatched(df: DataFrame, batchSize: Int = 64,
      decoder: MediaDecoder = StrideDecoder): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("features", ArrayType(IntegerType))))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    // decode is the per-row hot loop: a single-split scan must spread or
    // every payload decodes on one core
    val projected = Spread(df.select(col("media_id"), col("payload"),
      col("meta.format").as("format"), col("meta.n_bytes").as("n_bytes")))
    projected.mapPartitions { it: Iterator[Row] =>
      it.grouped(batchSize).flatMap { batch =>
        // the whole batch goes through the decoder seam in ONE call — the
        // vectorized-codec shape ([[MediaDecoder.decodeBatch]])
        val feats = decoder.decodeBatch(batch.map(r =>
          (r.getAs[Array[Byte]]("payload"), r.getAs[String]("format"))))
        batch.lazyZip(feats).map { (r, f) =>
          Row(r.getAs[Long]("media_id"), r.getAs[String]("format"),
            r.getAs[Long]("n_bytes"), f.toSeq)
        }
      }
    }(encoder)
  }

  /** Resize/resample a media payload down to at most `targetBytes` bytes —
    * the third multimodal verb beside feature extraction and frame
    * sampling. Stride k = ceil(n / targetBytes) keeps every k-th byte
    * starting at offset 0, so output length m = ceil(n / k) <= targetBytes
    * for ANY input size, with metadata (orig_bytes, stride, new_bytes)
    * carried alongside the resized content's digest.
    *
    * ==== STUB boundary ==== a real implementation decodes the payload and
    * resamples in the signal domain (bilinear pixels, sinc audio); with no
    * codec libraries in this environment the "resample" is byte-stride
    * decimation. The pipeline mechanics — stride math, hard output bound,
    * metadata update, zero-exchange narrow map (plan-pinned in
    * LlmOpsSpec) — are the real, tested part. Like [[sampleFrames]]'s
    * oracle, the DuckDB replay selects chars where Spark selects bytes:
    * valid under the spec-asserted ASCII-payload precondition.
    */
  def resizePayload(media: DataFrame, targetBytes: Int = 64,
      decoder: MediaDecoder = StrideDecoder): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    // foreign codecs resample in the row path; the default stride decoder
    // keeps the codegen'd Column spelling (differential in MediaDecoderSpec)
    if (!(decoder eq StrideDecoder))
      return resizeRows(media, targetBytes, decoder)
    media
      .withColumn("_stride", greatest(
        expr(s"(meta.n_bytes + ${targetBytes - 1}) div $targetBytes"), lit(1L)))
      .withColumn("_m", expr("(meta.n_bytes + _stride - 1) div _stride"))
      .withColumn("_txt", decode(col("payload"), "UTF-8"))
      .withColumn("resized",
        when(col("_m") <= 0L, lit(""))
          .otherwise(array_join(
            transform(sequence(lit(0L), col("_m") - 1L),
              i => col("_txt").substr((i * col("_stride") + 1L).cast("int"),
                lit(1))), "")))
      .select(col("media_id"),
        col("meta.n_bytes").as("orig_bytes"),
        col("_stride").as("stride"),
        octet_length(col("resized")).cast("long").as("new_bytes"),
        md5(encode(col("resized"), "UTF-8")).as("resized_digest"))
  }

  /** The decoder-generic row path behind [[resizePayload]]: same schema and
    * metadata columns (`stride` stays the REQUESTED decimation factor
    * ceil(n / targetBytes) — a signal-domain codec may resample any way it
    * likes as long as the <= targetBytes output bound holds, which is
    * asserted per row), content columns from `decoder.resize`. Narrow
    * per-partition map, no exchange.
    */
  private[operators] def resizeRows(media: DataFrame, targetBytes: Int,
      decoder: MediaDecoder): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("orig_bytes", LongType),
      StructField("stride", LongType),
      StructField("new_bytes", LongType),
      StructField("resized_digest", StringType)))
    val projected = Spread(media.select(col("media_id"), col("payload"),
      col("meta.format").as("format"), col("meta.n_bytes").as("n_bytes")))
    projected.mapPartitions { it: Iterator[Row] =>
      it.map { r =>
        val nBytes = r.getAs[Long]("n_bytes")
        val resized = decoder.resize(r.getAs[Array[Byte]]("payload"),
          r.getAs[String]("format"), targetBytes)
        require(resized.length <= targetBytes,
          s"decoder broke the resize bound: ${resized.length} > $targetBytes " +
            s"bytes for media_id=${r.getAs[Long]("media_id")}")
        Row(r.getAs[Long]("media_id"), nBytes,
          math.max(1L, (nBytes + targetBytes - 1) / targetBytes),
          resized.length.toLong, md5Hex(resized))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
