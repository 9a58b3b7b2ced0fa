package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top-level fixtures so Spark closures don't capture the spec class. */
object MediaDecoderSpecFixtures {

  /** A deliberately different "codec": reversed frames, xor-mangled resize,
    * constant features — distinguishable from the stride default in every
    * content column.
    */
  object XorDecoder extends MediaDecoder {
    override def features(payload: Array[Byte], format: String): Array[Int] =
      Array.fill(MediaOps.featureDim)(7)
    override def resize(payload: Array[Byte], format: String,
                        targetBytes: Int): Array[Byte] =
      payload.take(targetBytes).map(b => (b ^ 0x5a).toByte)
    override def frame(payload: Array[Byte], offsetBytes: Long,
                       frameBytes: Int): Array[Byte] =
      StrideDecoder.frame(payload, offsetBytes, frameBytes).reverse
  }

  /** Breaks the resize output bound — must fail fast, not ship rows. */
  object OversizeDecoder extends MediaDecoder {
    override def features(payload: Array[Byte], format: String): Array[Int] =
      Array.fill(MediaOps.featureDim)(0)
    override def resize(payload: Array[Byte], format: String,
                        targetBytes: Int): Array[Byte] =
      new Array[Byte](targetBytes + 1)
    override def frame(payload: Array[Byte], offsetBytes: Long,
                       frameBytes: Int): Array[Byte] = Array.emptyByteArray
  }
}

/** The [[MediaDecoder]] seam: (1) the default stride decoder's generic row
  * path is bit-identical to the codegen'd Column spelling the catalog rows
  * ride (so a real codec can drop into the SAME contract the catalog
  * verifies), (2) the catalog rows are decoder-INDEPENDENT up to the
  * content columns — swapping the codec changes features/digests only,
  * never row identity, timeline, or metadata — and (3) a decoder that
  * violates the resize output bound fails fast.
  */
class MediaDecoderSpec extends SparkSpec {
  import MediaDecoderSpecFixtures._

  private val sf = "/root/testdata/sf0.001"

  private def media: DataFrame =
    MediaOps.asMedia(Tables.documents(spark, sf), "doc_id", "text")

  private def canon(df: DataFrame, cols: Seq[String]): Seq[String] =
    df.select(concat_ws("|", cols.map(c => col(c).cast("string")): _*))
      .collect().map(_.getString(0)).sorted.toSeq

  test("stride decoder: generic row path == codegen'd column path, " +
       "full-row including digests") {
    val frameCols =
      Seq("media_id", "frame_idx", "ts_ms", "frame_digest", "n_frames")
    val fCol = canon(MediaOps.sampleFrames(media), frameCols)
    val fRow = canon(MediaOps.sampleFramesRows(media, everyMs = 250,
      frameBytes = 16, bytesPerMs = 1, maxFrames = 10000, StrideDecoder),
      frameCols)
    assert(fCol.nonEmpty && fCol == fRow)

    val resizeCols =
      Seq("media_id", "orig_bytes", "stride", "new_bytes", "resized_digest")
    val rCol = canon(MediaOps.resizePayload(media, targetBytes = 64), resizeCols)
    val rRow = canon(MediaOps.resizeRows(media, targetBytes = 64, StrideDecoder),
      resizeCols)
    assert(rCol.nonEmpty && rCol == rRow)

    val featCols = Seq("media_id", "format", "n_bytes", "features")
    val dBat = canon(MediaOps.decodeFeaturesBatched(media), featCols)
    val dCol = canon(MediaOps.featureColumns(media), featCols)
    assert(dBat.nonEmpty && dBat == dCol)
  }

  test("catalog rows are decoder-independent up to the content columns") {
    // frames: identical timeline/identity for ANY decoder...
    val idCols = Seq("media_id", "frame_idx", "ts_ms", "n_frames")
    val defFrames = MediaOps.sampleFrames(media)
    val xorFrames = MediaOps.sampleFrames(media, decoder = XorDecoder)
    assert(canon(defFrames, idCols) == canon(xorFrames, idCols))
    // ...while the content digests actually respond to the codec
    assert(canon(defFrames, Seq("frame_digest")) !=
           canon(xorFrames, Seq("frame_digest")))

    // resize: identity/metadata stable, content decoder-owned
    val rIdCols = Seq("media_id", "orig_bytes", "stride")
    val defR = MediaOps.resizePayload(media, targetBytes = 64)
    val xorR = MediaOps.resizePayload(media, targetBytes = 64,
      decoder = XorDecoder)
    assert(canon(defR, rIdCols) == canon(xorR, rIdCols))
    assert(canon(defR, Seq("resized_digest")) != canon(xorR, Seq("resized_digest")))

    // features: identity/metadata stable, feature vector decoder-owned
    val fIdCols = Seq("media_id", "format", "n_bytes")
    val defF = MediaOps.decodeFeaturesBatched(media)
    val xorF = MediaOps.decodeFeaturesBatched(media, decoder = XorDecoder)
    assert(canon(defF, fIdCols) == canon(xorF, fIdCols))
    assert(canon(defF, Seq("features")) != canon(xorF, Seq("features")))
  }

  test("a decoder that breaks the resize output bound fails fast") {
    val ex = intercept[Exception] {
      MediaOps.resizePayload(media, targetBytes = 8,
        decoder = OversizeDecoder).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("resize bound")),
      s"unexpected failure: $ex")
  }
}
