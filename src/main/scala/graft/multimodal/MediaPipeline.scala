package graft.multimodal

import graft.model.{Doc, SpanKinds}
import org.apache.spark.sql.Dataset

/** Multimodal column plumbing: media payloads as opaque binary with typed
  * metadata, decoded/feature-extracted in batched partition-local passes.
  *
  * The actual codec step is STUBBED — this container has no image/audio
  * libraries — behind [[MediaDecoder]]; [[StubDecoder]] is a deterministic
  * fake (dimensions/frames/features derived from the bytes) so the Spark
  * plumbing (schema, batching, partition-locality, determinism) is real and
  * tested while a production decoder (e.g. JNI to libvips/ffmpeg) can slot
  * in unchanged. (In PySpark this stage would be `mapInPandas` over Arrow
  * batches; the Scala-native equivalent is a batched mapPartitions.)
  */
final case class MediaRecord(
    doc_id: String, media_ref: String, media_type: String, bytes: Array[Byte])

final case class MediaFeatures(
    doc_id: String,
    media_ref: String,
    media_type: String,
    byte_len: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    histogram: Array[Float]) // 16-bin intensity histogram stand-in

trait MediaDecoder extends Serializable {
  def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Int, Array[Float])
}

/** Deterministic fake decode: a real implementation would parse the codec
  * headers; the stub derives everything from the payload bytes so outputs
  * are stable across runs/partitionings.
  */
object StubDecoder extends MediaDecoder {
  def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 16 * (1 + math.floorMod(h, 64))
    val height = 16 * (1 + math.floorMod(h >> 6, 64))
    val frames = mediaType match {
      case "video" => 1 + math.floorMod(h >> 12, 300)
      case "audio" => 1 + math.floorMod(h >> 12, 1000)
      case _       => 1
    }
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist(math.floorMod(bytes(i), 16)) += 1f; i += 1 }
    if (bytes.length > 0) { var j = 0; while (j < 16) { hist(j) /= bytes.length; j += 1 } }
    (width, height, frames, hist)
  }
}

object MediaPipeline {

  private def mediaTypeOf(ref: String): String =
    math.floorMod(ref.hashCode, 3) match {
      case 0 => "image"; case 1 => "audio"; case _ => "video"
    }

  /** Deterministic payload synthesis from the media_ref (the testdata carries
    * refs, not bytes; a real table would have a binary column here).
    */
  def syntheticBytes(ref: String): Array[Byte] = {
    val seed = ref.hashCode.toLong & 0xffffffffL
    val n = 64 + (seed % 1024).toInt
    val out = new Array[Byte](n)
    var x = seed | 1
    var i = 0
    while (i < n) { x = x * 6364136223846793005L + 1442695040888963407L; out(i) = (x >>> 33).toByte; i += 1 }
    out
  }

  /** Media spans of extracted docs → typed binary records. */
  def mediaRecords(docs: Dataset[Doc]): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      d.spans.collect {
        case s if s.kind == SpanKinds.Media && s.media_ref.nonEmpty =>
          MediaRecord(d.doc_id, s.media_ref, mediaTypeOf(s.media_ref), syntheticBytes(s.media_ref))
      }
    }
  }

  /** Batched partition-local decode/feature-extract. `batchSize` shapes the
    * inner batches the way Arrow record batches would in mapInPandas —
    * a real decoder amortizes codec init per batch.
    */
  def extractFeatures(
      records: Dataset[MediaRecord],
      decoder: MediaDecoder = StubDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val (w, h, f, hist) = decoder.decode(r.media_type, r.bytes)
          MediaFeatures(r.doc_id, r.media_ref, r.media_type, r.bytes.length.toLong, w, h, f, hist)
        }
      }
    }
  }

  /** Frame sampling stub for video/audio: deterministic every-k indices. */
  def sampleFrameIndices(nFrames: Int, k: Int): Seq[Int] =
    if (nFrames <= 0 || k <= 0) Nil
    else (0 until nFrames by math.max(1, nFrames / k)).take(k)
}
