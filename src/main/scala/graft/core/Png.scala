package graft.core

/** Minimal PNG codec — no imageio: 8-bit greyscale (color type 0) and
  * RGB (color type 2), non-interlaced, all five scanline filters
  * (None/Sub/Up/Average/Paeth), zlib IDAT via `java.util.zip` (the same
  * inflater the TIFF DEFLATE path uses). This is the real image decode
  * behind `engine/Multimodal` — the container has no media libraries, so
  * the codec pair is self-contained: the encoder builds valid PNGs for
  * the deterministic media generator and fixtures, the decoder recovers
  * the exact pixel bytes. Public-spec implementation (PNG is RFC 2083 /
  * ISO 15948); CRC32 from `java.util.zip.CRC32`.
  */
object Png {

  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width x $height x $channels")
  }

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    out.write(be32(data.length))
    val t = typ.getBytes("US-ASCII")
    out.write(t)
    out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    out.write(be32(crc.getValue.toInt))
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode an image; `filterFor(row)` picks the scanline filter (0..4)
    * so tests can exercise every decode path. Default cycles all five. */
  def encode(img: Image, filterFor: Int => Int = _ % 5): Array[Byte] = {
    val Image(w, h, ch, px) = img
    require(ch == 1 || ch == 3, s"channels $ch (grey or RGB)")
    val stride = w * ch
    val raw = new Array[Byte](h * (stride + 1))
    var r = 0
    while (r < h) {
      val f = filterFor(r)
      require(f >= 0 && f <= 4, s"filter $f")
      raw(r * (stride + 1)) = f.toByte
      var i = 0
      while (i < stride) {
        val cur = px(r * stride + i) & 0xff
        val left = if (i >= ch) px(r * stride + i - ch) & 0xff else 0
        val up = if (r > 0) px((r - 1) * stride + i) & 0xff else 0
        val ul = if (r > 0 && i >= ch) px((r - 1) * stride + i - ch) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(r * (stride + 1) + 1 + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) zOut.write(buf, 0, d.deflate(buf))
    d.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write(be32(w)); ihdr.write(be32(h))
    ihdr.write(8) // bit depth
    ihdr.write(if (ch == 1) 0 else 2) // color type
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // compression/filter/interlace
    chunk(out, "IHDR", ihdr.toByteArray)
    chunk(out, "IDAT", zOut.toByteArray)
    chunk(out, "IEND", Array.empty)
    out.toByteArray
  }

  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length > 8 && (0 until 8).forall(i => bytes(i) == Signature(i))

  /** Decode a PNG produced by any conformant encoder within the supported
    * profile (8-bit grey/RGB, non-interlaced); concatenates multiple IDAT
    * chunks, reverses all five filters. */
  def decode(bytes: Array[Byte]): Image = {
    require(isPng(bytes), "not a PNG: bad signature")
    def be32At(off: Int): Int =
      ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    var off = 8
    var w = 0; var h = 0; var ch = 0
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && off + 8 <= bytes.length) {
      val len = be32At(off)
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val dataOff = off + 8
      typ match {
        case "IHDR" =>
          w = be32At(dataOff); h = be32At(dataOff + 4)
          val depth = bytes(dataOff + 8) & 0xff
          val color = bytes(dataOff + 9) & 0xff
          val interlace = bytes(dataOff + 12) & 0xff
          require(depth == 8, s"unsupported PNG bit depth $depth")
          require(color == 0 || color == 2, s"unsupported PNG color type $color")
          require(interlace == 0, "interlaced PNG unsupported")
          ch = if (color == 0) 1 else 3
        case "IDAT" => idat.write(bytes, dataOff, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
      off = dataOff + len + 4 // skip CRC
    }
    require(w > 0 && h > 0 && ch > 0, "PNG lacks IHDR")
    val stride = w * ch
    val raw = new Array[Byte](h * (stride + 1))
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (!inf.finished() && got < raw.length) {
      val n = inf.inflate(raw, got, raw.length - got)
      if (n == 0 && inf.needsInput())
        throw new java.io.IOException("truncated PNG IDAT stream")
      got += n
    }
    inf.end()
    require(got == raw.length, s"PNG scanline data short: $got of ${raw.length}")
    val px = new Array[Byte](h * stride)
    var r = 0
    while (r < h) {
      val f = raw(r * (stride + 1)) & 0xff
      var i = 0
      while (i < stride) {
        val v = raw(r * (stride + 1) + 1 + i) & 0xff
        val left = if (i >= ch) px(r * stride + i - ch) & 0xff else 0
        val up = if (r > 0) px((r - 1) * stride + i) & 0xff else 0
        val ul = if (r > 0 && i >= ch) px((r - 1) * stride + i - ch) & 0xff else 0
        val cur = f match {
          case 0 => v
          case 1 => v + left
          case 2 => v + up
          case 3 => v + (left + up) / 2
          case 4 => v + paeth(left, up, ul)
          case other => throw new IllegalArgumentException(s"PNG filter $other")
        }
        px(r * stride + i) = (cur & 0xff).toByte
        i += 1
      }
      r += 1
    }
    Image(w, h, ch, px)
  }
}

/** Minimal WAV (RIFF/PCM) codec for the audio modality: 16-bit signed
  * little-endian mono/stereo, the canonical 44-byte header. */
object Wav {

  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  def encode(a: Audio): Array[Byte] = {
    val dataLen = a.samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(a.channels.toShort)
      .putInt(a.sampleRate)
      .putInt(a.sampleRate * a.channels * 2) // byte rate
      .putShort((a.channels * 2).toShort) // block align
      .putShort(16) // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    a.samples.foreach(out.putShort)
    out.array()
  }

  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length > 44 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' &&
      bytes(11) == 'E'

  def decode(bytes: Array[Byte]): Audio = {
    require(isWav(bytes), "not a WAV: bad RIFF/WAVE header")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // walk chunks from offset 12: fmt before data, per spec
    var pos = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && samples == null) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = bb.getInt(pos + 4)
      // a negative (unsigned >2^31) or over-long chunk length would stall
      // the walk (pos += 8 + len advancing by <= 0) or read out of
      // bounds — refuse loudly; this decode runs inside executor tasks,
      // where an infinite loop is a hung job, not an exception. The bound
      // is written overflow-free (len near Int.MaxValue makes pos+8+len
      // wrap negative and sneak past a naive <=): the loop guarantees
      // pos + 8 <= bytes.length, so the subtraction cannot underflow.
      require(len >= 0 && len <= bytes.length - pos - 8,
        s"corrupt WAV: chunk '$id' length $len at offset $pos exceeds ${bytes.length}-byte payload")
      id match {
        case "fmt " =>
          require(bb.getShort(pos + 8) == 1, "non-PCM WAV unsupported")
          channels = bb.getShort(pos + 10)
          sampleRate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22)
          require(bits == 16, s"unsupported WAV bit depth $bits")
        case "data" =>
          require(sampleRate > 0, "WAV data chunk before fmt")
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = bb.getShort(pos + 8 + 2 * i); i += 1 }
        case _ => ()
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(samples != null, "WAV lacks a data chunk")
    Audio(sampleRate, channels, samples)
  }
}
