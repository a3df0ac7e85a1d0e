package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The uncompressed-format codecs must genuinely parse the containers: exact
  * round trips (incl. the fiddly parts — BMP 4-byte row padding and
  * bottom-up storage, WAV chunk walking past unknown chunks), and malformed
  * payloads must be rejected, not misread.
  */
class CodecSpec extends AnyFunSuite {

  test("WAV: 16-bit PCM round trip preserves rate, channels, every sample") {
    val samples = Array.tabulate(301)(i => ((i * 977) % 65536 - 32768).toShort)
    val bytes = WavCodec.encode(11025, 1, samples)
    val w = WavCodec.decode(bytes)
    assert(w.sampleRate == 11025 && w.channels == 1 && w.bitsPerSample == 16)
    assert(w.samples.toSeq == samples.toSeq)
  }

  test("WAV: decoder walks past unknown chunks before fmt/data") {
    val samples = Array[Short](1, -2, 3, -4)
    val base = WavCodec.encode(8000, 2, samples)
    // splice a LIST chunk (5 bytes + pad) between WAVE and fmt
    val list = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = base.take(12) ++ list ++ base.drop(12)
    val w = WavCodec.decode(spliced)
    assert(w.sampleRate == 8000 && w.channels == 2 && w.samples.toSeq == samples.toSeq)
  }

  test("WAV: truncated and non-PCM payloads are rejected") {
    val ok = WavCodec.encode(8000, 1, Array[Short](1, 2, 3))
    intercept[IllegalArgumentException](WavCodec.decode(ok.take(10)))
    intercept[IllegalArgumentException](WavCodec.decode("RIFFxxxxJUNK".getBytes ++ ok.drop(12)))
    val nonPcm = ok.clone; nonPcm(20) = 3 // audioFormat = IEEE float
    intercept[IllegalArgumentException](WavCodec.decode(nonPcm))
  }

  test("BMP: 24bpp round trip preserves dimensions and every pixel (odd width -> padding)") {
    val (w, h) = (5, 3) // rowSize 15 -> padded to 16
    val px = Array.tabulate(w * h)(i => (i * 0x10203) & 0xffffff)
    val bytes = BmpCodec.encode(w, h, px)
    assert(bytes.length == 54 + 16 * h)
    val img = BmpCodec.decode(bytes)
    assert(img.width == w && img.height == h)
    assert(img.pixels.toSeq == px.toSeq)
  }

  test("BMP: truncated pixel data and unsupported bpp are rejected") {
    val bytes = BmpCodec.encode(4, 4, Array.fill(16)(0xabcdef))
    intercept[IllegalArgumentException](BmpCodec.decode(bytes.take(60)))
    val bad = bytes.clone; bad(28) = 8 // bpp = 8
    intercept[IllegalArgumentException](BmpCodec.decode(bad))
  }

  test("BMP: negative/into-header data offsets are rejected, not raw-indexed") {
    val bytes = BmpCodec.encode(4, 4, Array.fill(16)(0xabcdef))
    val negOff = bytes.clone
    negOff(10) = 0; negOff(11) = 0; negOff(12) = 0; negOff(13) = 0x80.toByte // dataOffset = Int.MinValue
    intercept[IllegalArgumentException](BmpCodec.decode(negOff))
    val inHeader = bytes.clone
    inHeader(10) = 10 // points inside the header
    intercept[IllegalArgumentException](BmpCodec.decode(inHeader))
  }

  test("SniffDecoder: parses real containers, falls back to stub on unknown magic") {
    val wav = WavCodec.encode(16000, 1, Array.tabulate(64)(i => (i * 1024 - 32768).toShort))
    val (rate, bits, frames, hist) = SniffDecoder.decode("audio", wav)
    assert(rate == 16000 && bits == 16 && frames == 64)
    assert(math.abs(hist.sum - 1.0f) < 1e-3)
    val bmp = BmpCodec.encode(7, 2, Array.fill(14)(0x808080))
    val (w, h, f, bhist) = SniffDecoder.decode("image", bmp)
    assert(w == 7 && h == 2 && f == 1)
    assert(math.abs(bhist(8) - 1.0f) < 1e-6) // all pixels intensity 128 -> bucket 8
    val opaque = Array.tabulate(100)(i => (i * 7).toByte)
    val (sw, sh, sf, shist) = SniffDecoder.decode("video", opaque)
    val (tw, th, tf, thist) = StubDecoder.decode("video", opaque)
    assert((sw, sh, sf, shist.toSeq) == (tw, th, tf, thist.toSeq))
  }
}
