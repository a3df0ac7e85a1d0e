package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-Scala codecs for the two standard UNCOMPRESSED media container
  * formats — no codec libraries exist in this container, but RIFF/WAVE PCM
  * and BMP (BITMAPINFOHEADER, 24bpp, BI_RGB) need none: both are plain
  * header + raw samples, defined by their public specs. These are real
  * encoders/decoders (chunk walking, padding, bounds checks — not fakes),
  * so the multimodal pipeline genuinely decodes what it reads for
  * uncompressed payloads; compressed formats (JPEG/MP3/H.264) stay behind
  * the same [[MediaDecoder]] trait for a production JNI decoder.
  *
  * Both decoders throw IllegalArgumentException on malformed input; the
  * pipeline layer counts failures instead of propagating them (the same
  * doctrine as ExtractJob's kernel failure counting).
  */
object WavCodec {

  final case class WavInfo(sampleRate: Int, bitsPerSample: Int, channels: Int, samples: Array[Short])

  /** Minimal canonical PCM WAV: RIFF header + fmt + data chunks, 16-bit LE. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val blockAlign = channels * 2
    require(samples.length % channels == 0, "sample count must be a multiple of channels")
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Chunk-walking decode: finds fmt/data wherever they sit (real WAV files
    * may carry LIST/INFO chunks between them).
    */
  def decode(bytes: Array[Byte]): WavInfo = {
    def fail(msg: String) = throw new IllegalArgumentException(s"bad WAV: $msg")
    if (bytes.length < 12) fail("truncated RIFF header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4); buf.get(magic)
    if (new String(magic, "US-ASCII") != "RIFF") fail("not RIFF")
    buf.getInt // riff size (ignored; files in the wild lie)
    buf.get(magic)
    if (new String(magic, "US-ASCII") != "WAVE") fail("not WAVE")
    var sampleRate = -1; var bits = -1; var channels = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8) {
      buf.get(magic)
      val id = new String(magic, "US-ASCII")
      val size = buf.getInt
      if (size < 0 || size > buf.remaining()) fail(s"chunk $id overruns payload")
      val next = buf.position() + size + (size & 1) // chunks are word-aligned
      id match {
        case "fmt " =>
          if (size < 16) fail("fmt chunk too small")
          val audioFormat = buf.getShort
          if (audioFormat != 1) fail(s"not PCM (format $audioFormat)")
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt   // byte rate
          buf.getShort // block align
          bits = buf.getShort.toInt
          if (bits != 16) fail(s"only 16-bit PCM supported, got $bits")
          if (channels <= 0 || sampleRate <= 0) fail("non-positive channels/rate")
        case "data" =>
          if (sampleRate < 0) fail("data chunk before fmt")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
        case _ => () // skip unknown chunks (LIST, INFO, ...)
      }
      buf.position(next)
    }
    if (samples == null) fail("no data chunk")
    WavInfo(sampleRate, bits, channels, samples)
  }
}

object BmpCodec {

  final case class BmpInfo(width: Int, height: Int, pixels: Array[Int]) // 0xRRGGBB, row-major top-down

  /** 24bpp BI_RGB bottom-up BMP with the standard 54-byte header and 4-byte
    * row padding.
    */
  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == width * height, "pixel count must be width*height")
    val rowSize = (width * 3 + 3) & ~3
    val dataSize = rowSize * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0) // BI_RGB
      .putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val p = pixels(y * width + x)
        buf.put((p & 0xff).toByte).put(((p >> 8) & 0xff).toByte).put(((p >> 16) & 0xff).toByte)
        x += 1
      }
      var pad = rowSize - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  def decode(bytes: Array[Byte]): BmpInfo = {
    def fail(msg: String) = throw new IllegalArgumentException(s"bad BMP: $msg")
    if (bytes.length < 54) fail("truncated header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (buf.get() != 'B'.toByte || buf.get() != 'M'.toByte) fail("not BM")
    buf.getInt; buf.getShort; buf.getShort
    val dataOffset = buf.getInt
    if (dataOffset < 54 || dataOffset > bytes.length) fail(s"bad pixel data offset $dataOffset")
    val headerSize = buf.getInt
    if (headerSize < 40) fail(s"unsupported DIB header size $headerSize")
    val width = buf.getInt
    val heightRaw = buf.getInt
    val topDown = heightRaw < 0
    val height = math.abs(heightRaw)
    buf.getShort // planes
    val bpp = buf.getShort.toInt
    val compression = buf.getInt
    if (bpp != 24) fail(s"only 24bpp supported, got $bpp")
    if (compression != 0) fail(s"only BI_RGB supported, got $compression")
    if (width <= 0 || height <= 0 || width > (1 << 20) || height > (1 << 20)) fail("bad dimensions")
    val rowSize = (width * 3 + 3) & ~3
    if (dataOffset.toLong + rowSize.toLong * height > bytes.length) fail("pixel data overruns payload")
    val pixels = new Array[Int](width * height)
    var row = 0
    while (row < height) {
      val srcY = if (topDown) row else height - 1 - row
      var x = 0
      var off = dataOffset + srcY * rowSize
      while (x < width) {
        val b = bytes(off) & 0xff; val g = bytes(off + 1) & 0xff; val r = bytes(off + 2) & 0xff
        pixels(row * width + x) = (r << 16) | (g << 8) | b
        x += 1; off += 3
      }
      row += 1
    }
    BmpInfo(width, height, pixels)
  }
}
