package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** PNG codec (grayscale 8-bit, color type 0) — the DEFLATE-compressed
  * format in the codec family, implemented from the public PNG spec over
  * the JDK's public `java.util.zip`: big-endian chunk framing with CRC32
  * verification, zlib-wrapped scanlines, and ALL FIVE filter types
  * (None/Sub/Up/Average/Paeth). The encoder deliberately cycles the filter
  * per row (y % 5), so every decode in the oracle path reconstructs
  * through every filter algorithm — a Paeth-predictor or Average-floor
  * defect diverges the pixels and fails the driver's hash compare.
  * (Deflater BYTES are zlib-version specific, so unlike BMP/PPM the
  * container length is not oracle-gated — the decoded pixels are.) */
object PngCodec {

  private val Sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def rdBe32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val t = tag.getBytes("US-ASCII")
    val crc = new CRC32
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  /** Paeth predictor (PNG spec §9.4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode the luma plane as an 8-bit grayscale PNG; filter type cycles
    * y % 5 so decoders must implement the full filter suite. */
  def encodePng(img: ImageCodec.Image): Array[Byte] = {
    val w = img.width; val h = img.height
    val raw = new Array[Byte](h * (w + 1))
    var y = 0
    while (y < h) {
      val f = y % 5
      raw(y * (w + 1)) = f.toByte
      var x = 0
      while (x < w) {
        val cur = img.luma(y * w + x)
        val left = if (x > 0) img.luma(y * w + x - 1) else 0
        val up = if (y > 0) img.luma((y - 1) * w + x) else 0
        val ul = if (x > 0 && y > 0) img.luma((y - 1) * w + x - 1) else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case _ => cur - paeth(left, up, ul)
        }
        raw(y * (w + 1) + 1 + x) = (filtered & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION)
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    while (!defl.finished()) {
      val n = defl.deflate(buf)
      out ++= buf.take(n)
    }
    defl.end()
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 0, 0, 0, 0) // depth 8, gray
    Sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Parse an 8-bit grayscale PNG at `off`: CRC-verified chunk walk,
    * inflate, unfilter all five types. Returns (image, byte length). */
  def decodePng(bytes: Array[Byte], off: Int = 0): (ImageCodec.Image, Int) = {
    require(bytes.length >= off + 8 &&
      (0 until 8).forall(i => bytes(off + i) == Sig(i)), "PNG: bad signature")
    var p = off + 8
    var w = -1; var h = -1
    val idat = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var done = false
    while (!done) {
      require(bytes.length >= p + 8, "PNG: truncated chunk header")
      val len = rdBe32(bytes, p)
      require(len >= 0 && bytes.length >= p + 12 + len, "PNG: truncated chunk")
      val tag = new String(bytes, p + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(bytes, p + 4, 4 + len)
      require(crc.getValue.toInt == rdBe32(bytes, p + 8 + len),
        s"PNG: CRC mismatch in $tag")
      tag match {
        case "IHDR" =>
          require(len == 13, "PNG: bad IHDR length")
          w = rdBe32(bytes, p + 8); h = rdBe32(bytes, p + 12)
          require(bytes(p + 16) == 8, "PNG: only bit depth 8 supported")
          require(bytes(p + 17) == 0, "PNG: only grayscale (type 0) supported")
          require(bytes(p + 18) == 0 && bytes(p + 19) == 0 && bytes(p + 20) == 0,
            "PNG: unsupported compression/filter/interlace")
        case "IDAT" => idat ++= bytes.slice(p + 8, p + 8 + len)
        case "IEND" => done = true
        case _ => () // ancillary chunk: CRC already verified, skip
      }
      p += 12 + len
    }
    require(w > 0 && h > 0, "PNG: missing IHDR")
    // Size math in Long BEFORE allocating (ADVICE r14): huge declared
    // dimensions otherwise overflow Int (NegativeArraySizeException) or
    // allocate gigabytes — escaping the documented IllegalArgumentException
    // failure mode. The inflated stream can't exceed the compressed input
    // by more than DEFLATE's theoretical bound, but the simple safe cap is
    // the raster itself: it must be expandable from the IDAT bytes present.
    val rawLen = h.toLong * (w.toLong + 1L)
    require(rawLen <= Int.MaxValue && h.toLong * w.toLong <= Int.MaxValue,
      s"PNG: declared geometry ${w}x$h overflows")
    val raw = new Array[Byte](rawLen.toInt)
    val infl = new Inflater
    infl.setInput(idat.toArray)
    var got = 0
    while (got < raw.length && !infl.finished()) {
      val n = infl.inflate(raw, got, raw.length - got)
      require(n > 0 || infl.finished(), "PNG: inflate stalled")
      got += n
    }
    infl.end()
    require(got == raw.length, s"PNG: inflated $got of ${raw.length} bytes")
    val lum = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val f = raw(y * (w + 1)) & 0xff
      var x = 0
      while (x < w) {
        val v = raw(y * (w + 1) + 1 + x) & 0xff
        val left = if (x > 0) lum(y * w + x - 1) else 0
        val up = if (y > 0) lum((y - 1) * w + x) else 0
        val ul = if (x > 0 && y > 0) lum((y - 1) * w + x - 1) else 0
        lum(y * w + x) = f match {
          case 0 => v
          case 1 => (v + left) & 0xff
          case 2 => (v + up) & 0xff
          case 3 => (v + (left + up) / 2) & 0xff
          case 4 => (v + paeth(left, up, ul)) & 0xff
          case other => throw new IllegalArgumentException(s"PNG: bad filter $other")
        }
        x += 1
      }
      y += 1
    }
    (ImageCodec.Image(w, h, lum, lum.clone(), lum.clone()), p - off)
  }
}
