package graft.ops

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Pure-JVM media codecs: binary PPM (P6) images and PCM WAV (RIFF)
  * audio — real, byte-exact parsers/writers with zero dependencies, so
  * the multimodal pipeline decodes REAL pixels and REAL samples in this
  * environment (no image/audio libraries exist here; both formats are
  * uncompressed by design, which is exactly why they can be implemented
  * faithfully in-tree). Compressed formats (JPEG/FLAC/H.264) slot in at
  * the same seam via JNI in production.
  */
object Codecs {

  /** Interleaved 8-bit RGB. */
  final case class Image(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3,
      s"RGB payload must be w*h*3 = ${width * height * 3}, got ${pixels.length}")
  }

  /** PCM 16-bit signed, interleaved channels. */
  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  // ------------------------------------------------------------- PPM (P6)

  /** Binary PPM: `P6\n<w> <h>\n<maxval>\n<raster: w*h*3 bytes>`. */
  def encodePpm(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Parse binary PPM, honoring whitespace runs and `#` comments in the
    * header (the full P6 grammar). */
  def decodePpm(bytes: Array[Byte]): Image = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 PPM payload")
    var pos = 2
    def nextInt(): Int = {
      // skip whitespace and comments
      var inComment = false
      while (pos < bytes.length &&
        (inComment || bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#') inComment = true
        else if (bytes(pos) == '\n') inComment = false
        pos += 1
      }
      var v = 0
      while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) {
        val c = bytes(pos)
        require(c >= '0' && c <= '9', s"bad PPM header byte $c")
        v = v * 10 + (c - '0')
        pos += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(maxval == 255, s"only 8-bit PPM supported, maxval=$maxval")
    pos += 1 // exactly one whitespace byte separates header from raster
    val n = w * h * 3
    require(bytes.length - pos >= n,
      s"PPM raster truncated: need $n bytes, have ${bytes.length - pos}")
    val px = new Array[Byte](n)
    System.arraycopy(bytes, pos, px, 0, n)
    Image(w, h, px)
  }

  /** Nearest-neighbor RGB resample — a REAL resampler over decoded
    * pixels (each destination pixel maps to its source pixel's 3
    * channels). */
  def resizeNearest(img: Image, dstW: Int, dstH: Int): Image = {
    val out = new Array[Byte](dstW * dstH * 3)
    var y = 0
    while (y < dstH) {
      val sy = (y.toLong * img.height / dstH).toInt
      var x = 0
      while (x < dstW) {
        val sx = (x.toLong * img.width / dstW).toInt
        val s = (sy * img.width + sx) * 3
        val d = (y * dstW + x) * 3
        out(d) = img.pixels(s); out(d + 1) = img.pixels(s + 1)
        out(d + 2) = img.pixels(s + 2)
        x += 1
      }
      y += 1
    }
    Image(dstW, dstH, out)
  }

  // ---------------------------------------------------------- WAV (RIFF)

  /** PCM 16-bit WAV: RIFF/WAVE container with `fmt ` + `data` chunks. */
  def encodeWav(a: Audio): Array[Byte] = {
    val dataLen = a.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(16)                          // PCM fmt chunk size
    buf.putShort(1)                         // audio format: PCM
    buf.putShort(a.channels.toShort)
    buf.putInt(a.sampleRate)
    buf.putInt(a.sampleRate * a.channels * 2) // byte rate
    buf.putShort((a.channels * 2).toShort)  // block align
    buf.putShort(16)                        // bits per sample
    buf.put("data".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(dataLen)
    a.samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a PCM WAV by walking RIFF chunks (tolerates extra chunks like
    * LIST/INFO between fmt and data — the full container grammar, not a
    * fixed 44-byte offset assumption). */
  def decodeWav(bytes: Array[Byte]): Audio = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); buf.get(t)
      new String(t, StandardCharsets.US_ASCII)
    }
    require(tag() == "RIFF", "not a RIFF payload")
    buf.getInt // riff size
    require(tag() == "WAVE", "not a WAVE payload")
    var sampleRate = -1; var channels = -1; var bits = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (samples == null || sampleRate < 0)) {
      val id = tag(); val size = buf.getInt
      id match {
        case "fmt " =>
          val fmt = buf.getShort
          require(fmt == 1, s"only PCM wav supported, format=$fmt")
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          bits = buf.getShort.toInt
          require(bits == 16, s"only 16-bit PCM supported, bits=$bits")
          if (size > 16) buf.position(buf.position() + (size - 16))
        case "data" =>
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
          // RIFF chunks are word-aligned: skip the pad byte after an
          // odd-sized data chunk, or the next chunk tag reads one byte
          // off and a later fmt chunk is never found
          if ((size & 1) == 1 && buf.remaining() > 0)
            buf.position(buf.position() + 1)
        case _ => // skip unknown chunk (word-aligned)
          buf.position(buf.position() + size + (size & 1))
      }
    }
    require(samples != null && sampleRate > 0, "missing fmt /data chunk")
    Audio(sampleRate, channels, samples)
  }

  // ------------------------------------------------------------- sniffing

  /** Identify a payload's container by magic bytes. */
  def sniff(payload: Array[Byte]): String =
    if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6') "ppm"
    else if (payload.length >= 4 && payload(0) == 'R' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == 'F') "wav"
    else "unknown"
}
