package graft.multimodal

import graft.model.{Doc, SpanKinds}
import org.apache.spark.sql.Dataset

/** Multimodal column plumbing: media payloads as opaque binary with typed
  * metadata, decoded/feature-extracted in batched partition-local passes.
  *
  * Decode is REAL for the uncompressed container formats — [[SniffDecoder]]
  * sniffs the payload magic and genuinely parses BMP (24bpp BI_RGB) and
  * RIFF/WAVE 16-bit PCM via [[BmpCodec]]/[[WavCodec]] (header walking,
  * padding, bounds checks; pure Scala, zero dependencies). Compressed
  * codecs (JPEG/MP3/H.264) have no libraries in this container and stay
  * behind the same [[MediaDecoder]] trait — [[StubDecoder]] is the
  * deterministic stand-in, and a production decoder (e.g. JNI to
  * libvips/ffmpeg) slots in unchanged. Parse failures are COUNTED, not
  * thrown (`parse_ok` = false), same doctrine as the extraction kernel. (In
  * PySpark this stage would be `mapInPandas` over Arrow batches; the
  * Scala-native equivalent is a batched mapPartitions.)
  */
final case class MediaRecord(
    doc_id: String, media_ref: String, media_type: String, bytes: Array[Byte])

final case class MediaFeatures(
    doc_id: String,
    media_ref: String,
    media_type: String,
    byte_len: Long,
    width: Int,      // image/video: pixels; audio: sample rate
    height: Int,     // image/video: pixels; audio: bits per sample
    n_frames: Int,   // image: 1; audio: PCM sample frames
    histogram: Array[Float], // 16-bin intensity (image) / |amplitude| (audio) histogram
    parse_ok: Boolean)

trait MediaDecoder extends Serializable {
  def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Int, Array[Float])
}

/** Deterministic fake decode for payloads with no parsable container (the
  * compressed-codec stand-in): derives everything from the payload bytes so
  * outputs are stable across runs/partitionings.
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

/** The REAL decoder: sniffs the container magic and parses uncompressed
  * formats genuinely — BMP ("BM") and RIFF/WAVE PCM ("RIFF…WAVE") — mapping
  * to the feature schema as (width, height, 1, intensity-histogram) for
  * images and (sampleRate, bitsPerSample, sampleFrames, |amplitude|-
  * histogram) for audio. Unknown magic (the compressed-codec case this
  * container can't decode) falls through to [[StubDecoder]]; malformed
  * payloads of a RECOGNIZED format throw, so the pipeline layer can count
  * them as parse failures rather than silently fabricating features.
  */
object SniffDecoder extends MediaDecoder {

  private def isBmp(b: Array[Byte]) =
    b.length >= 2 && b(0) == 'B'.toByte && b(1) == 'M'.toByte
  private def isWav(b: Array[Byte]) =
    b.length >= 12 && b(0) == 'R'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte &&
      b(3) == 'F'.toByte && b(8) == 'W'.toByte && b(9) == 'A'.toByte &&
      b(10) == 'V'.toByte && b(11) == 'E'.toByte

  def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Int, Array[Float]) =
    if (isBmp(bytes)) {
      val img = BmpCodec.decode(bytes)
      val hist = new Array[Float](16)
      var i = 0
      while (i < img.pixels.length) {
        val p = img.pixels(i)
        val intensity = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
        hist(intensity >> 4) += 1f
        i += 1
      }
      if (img.pixels.nonEmpty) { var j = 0; while (j < 16) { hist(j) /= img.pixels.length; j += 1 } }
      (img.width, img.height, 1, hist)
    } else if (isWav(bytes)) {
      val wav = WavCodec.decode(bytes)
      val hist = new Array[Float](16)
      var i = 0
      while (i < wav.samples.length) {
        val a = math.min(math.abs(wav.samples(i).toInt), 32767)
        hist(a >> 11) += 1f
        i += 1
      }
      if (wav.samples.nonEmpty) { var j = 0; while (j < 16) { hist(j) /= wav.samples.length; j += 1 } }
      (wav.sampleRate, wav.bitsPerSample, wav.samples.length / wav.channels, hist)
    } else StubDecoder.decode(mediaType, bytes)
}

object MediaPipeline {

  private def mediaTypeOf(ref: String): String =
    math.floorMod(ref.hashCode, 3) match {
      case 0 => "image"; case 1 => "audio"; case _ => "video"
    }

  /** Deterministic payload synthesis from the media_ref (the testdata carries
    * refs, not bytes; a real table would have a binary column here). Image
    * refs get a VALID 24bpp BMP and audio refs a VALID 16-bit PCM WAV, so
    * the decode stage parses real containers; video refs get opaque bytes
    * (compressed-codec stand-in handled by [[StubDecoder]]).
    */
  def syntheticBytes(ref: String): Array[Byte] = mediaTypeOf(ref) match {
    case "image" =>
      val seed = ref.hashCode.toLong & 0xffffffffL
      val w = 3 + (seed % 13).toInt // odd widths exercise row padding
      val h = 2 + ((seed >> 4) % 9).toInt
      val px = new Array[Int](w * h)
      var x = seed | 1
      var i = 0
      while (i < px.length) {
        x = x * 6364136223846793005L + 1442695040888963407L
        px(i) = ((x >>> 33) & 0xffffff).toInt
        i += 1
      }
      BmpCodec.encode(w, h, px)
    case "audio" =>
      val seed = ref.hashCode.toLong & 0xffffffffL
      val n = 32 + (seed % 256).toInt
      val samples = new Array[Short](n)
      var x = seed | 1
      var i = 0
      while (i < n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        samples(i) = ((x >>> 33) & 0xffff).toShort
        i += 1
      }
      WavCodec.encode(8000, 1, samples)
    case _ =>
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
    * a real decoder amortizes codec init per batch. A malformed payload
    * yields a `parse_ok = false` row instead of failing the task: one
    * corrupt file must not abort a 10^12-document job.
    */
  def extractFeatures(
      records: Dataset[MediaRecord],
      decoder: MediaDecoder = SniffDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          try {
            val (w, h, f, hist) = decoder.decode(r.media_type, r.bytes)
            MediaFeatures(r.doc_id, r.media_ref, r.media_type, r.bytes.length.toLong,
              w, h, f, hist, parse_ok = true)
          } catch {
            case scala.util.control.NonFatal(_) =>
              MediaFeatures(r.doc_id, r.media_ref, r.media_type, r.bytes.length.toLong,
                0, 0, 0, new Array[Float](16), parse_ok = false)
          }
        }
      }
    }
  }

  /** Frame sampling stub for video/audio: deterministic every-k indices. */
  def sampleFrameIndices(nFrames: Int, k: Int): Seq[Int] =
    if (nFrames <= 0 || k <= 0) Nil
    else (0 until nFrames by math.max(1, nFrames / k)).take(k)
}
