package graft.operators

/** The codec seam for [[MediaOps]]: every signal-domain operation — feature
  * extraction, resampling, frame decode — sits behind this trait, so a real
  * codec (JPEG decode, sinc audio resample, an MP4 container parser) drops
  * in without touching the catalog contract: the three `media_*` catalog
  * rows keep their schema, row identity, and every metadata column for ANY
  * decoder; only the content-derived columns (features, frame bytes,
  * digests) change with the decoder (spec-proven in MediaDecoderSpec).
  *
  * The offline default is [[StrideDecoder]], the deterministic byte-domain
  * stand-in this environment uses (no codec libraries ship here): features
  * from the payload md5, resize by byte-stride decimation, frames as byte
  * slices. [[MediaOps]] routes the default through codegen'd Column
  * implementations (zero-exchange narrow maps, plan-pinned); any other
  * decoder runs the same contract through the batched per-partition row
  * path — the shape a vectorized model runtime needs anyway.
  */
trait MediaDecoder extends Serializable {

  /** Fixed-length feature vector for one payload. */
  def features(payload: Array[Byte], format: String): Array[Int]

  /** Batch hook — the vectorized-codec entry point. Default maps
    * [[features]]; a real runtime overrides to decode the whole batch in
    * one call.
    */
  def decodeBatch(batch: Seq[(Array[Byte], String)]): Seq[Array[Int]] =
    batch.map { case (p, f) => features(p, f) }

  /** Resample `payload` down to at most `targetBytes` bytes. The returned
    * array's length MUST be <= targetBytes for any input (the hard output
    * bound the pipeline relies on).
    */
  def resize(payload: Array[Byte], format: String, targetBytes: Int): Array[Byte]

  /** Frame content for the frame starting at `offsetBytes`, at most
    * `frameBytes` long (tail frames run shorter). A real container parser
    * decodes the keyframe at that position; the offline default slices
    * bytes.
    */
  def frame(payload: Array[Byte], offsetBytes: Long, frameBytes: Int): Array[Byte]
}

/** The offline default: deterministic byte-domain stand-ins, bit-identical
  * to the codegen'd Column implementations in [[MediaOps]] (differential
  * spec-locked, full-row equality including digests).
  */
object StrideDecoder extends MediaDecoder {

  private def md5hex(payload: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(payload).map("%02x".format(_)).mkString

  override def features(payload: Array[Byte], format: String): Array[Int] =
    MediaOps.fakeFeatures(md5hex(payload))

  /** Stride decimation: k = ceil(n / targetBytes), keep every k-th byte
    * from offset 0 — output length ceil(n / k) <= targetBytes always.
    */
  override def resize(payload: Array[Byte], format: String,
                      targetBytes: Int): Array[Byte] = {
    val n = payload.length.toLong
    if (n == 0) return Array.emptyByteArray
    val stride = math.max(1L, (n + targetBytes - 1) / targetBytes)
    val m = ((n + stride - 1) / stride).toInt
    val out = new Array[Byte](m)
    var i = 0
    while (i < m) { out(i) = payload((i * stride).toInt); i += 1 }
    out
  }

  override def frame(payload: Array[Byte], offsetBytes: Long,
                     frameBytes: Int): Array[Byte] = {
    val from = math.min(offsetBytes, payload.length.toLong).toInt
    val until = math.min(offsetBytes + frameBytes, payload.length.toLong).toInt
    java.util.Arrays.copyOfRange(payload, from, until)
  }
}
