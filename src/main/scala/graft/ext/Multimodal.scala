package graft.ext

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, and expensive per-item decoding
  * runs batched inside `mapPartitions` — the Scala analogue of a
  * batch-shaped Pandas UDF. The actual codec call is STUBBED (this
  * container ships no image/audio libraries): `decodeBatchStub` derives
  * deterministic fake dimensions from the leading bytes, so the
  * surrounding plumbing — schema, batch shape, partition parallelism,
  * digest computation — is real and testable end-to-end.
  *
  * At 100 TB: media rows are large, so the table is stored with the
  * binary column in its own parquet column chunk (column pruning skips it
  * unless decoded), partitioned so one batch of `BatchSize` payloads fits
  * executor memory; decode is a map-only stage.
  */
object Multimodal {

  final case class MediaRow(id: Long, content: Array[Byte], mime: String)
  final case class MediaMeta(
      id: Long, byteLen: Int, width: Int, height: Int, frames: Int,
      digest: String)

  implicit val mediaRowEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val mediaMetaEnc: Encoder[MediaMeta] = Encoders.product[MediaMeta]

  /** payloads per decode batch — sized so a batch of decoded frames fits
    * comfortably in executor memory
    */
  val BatchSize = 64

  /** STUB decoder: a real implementation hands the whole batch to a codec
    * (JNI/FFI) and returns per-item metadata. The fake is deterministic
    * in the payload bytes so tests and oracles can replicate it:
    *   width  = 1 + (b0*256 + b1) mod 1024
    *   height = 1 + (b1*256 + b2) mod 768
    *   frames = 1 + byteLen mod 100
    */
  def decodeBatchStub(batch: Seq[MediaRow]): Seq[MediaMeta] = batch.map { m =>
    val b = m.content
    def u(i: Int): Int = if (b.length > i) b(i) & 0xFF else 0
    MediaMeta(
      id = m.id,
      byteLen = b.length,
      width = 1 + (u(0) * 256 + u(1)) % 1024,
      height = 1 + (u(1) * 256 + u(2)) % 768,
      frames = 1 + b.length % 100,
      digest = md5Hex(b))
  }

  /** batched decode over partitions — the real Spark-side shape */
  def decodeMeta(ds: Dataset[MediaRow]): Dataset[MediaMeta] =
    ds.mapPartitions(_.grouped(BatchSize).flatMap(decodeBatchStub))

  /** frame-sampling stub: pick ~8 evenly spaced frame indices */
  def sampleFrames(meta: MediaMeta, target: Int = 8): Seq[Int] = {
    val step = math.max(1, meta.frames / target)
    (0 until meta.frames by step).toSeq
  }

  final case class MediaFeature(id: Long, feature: Array[Double])
  implicit val mediaFeatureEnc: Encoder[MediaFeature] =
    Encoders.product[MediaFeature]

  /** STUB feature extractor: a deterministic `dims`-dim embedding —
    * per dimension j, the mean of bytes at positions j, j+dims, … scaled
    * to [0,1]. A real implementation hands the batch to a vision/audio
    * encoder (JNI/FFI); the batch shape, schema and partition
    * parallelism here are the real pipeline plumbing.
    */
  def featureBatchStub(batch: Seq[MediaRow], dims: Int = 8): Seq[MediaFeature] =
    batch.map { m =>
      val b = m.content
      val f = Array.tabulate(dims) { j =>
        var s = 0L
        var c = 0
        var i = j
        while (i < b.length) { s += (b(i) & 0xFF); i += dims; c += 1 }
        if (c == 0) 0.0 else s.toDouble / c / 255.0
      }
      MediaFeature(m.id, f)
    }

  /** batched feature extraction over partitions */
  def extractFeatures(ds: Dataset[MediaRow], dims: Int = 8): Dataset[MediaFeature] =
    ds.mapPartitions(_.grouped(BatchSize).flatMap(featureBatchStub(_, dims)))

  def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
}
