package graft.multimodal

/** GIF89a codec — the first COMPRESSED format in the codec family (r14):
  * palette-indexed frames with real variable-width LZW, implemented from
  * the public GIF89a specification. Grayscale profile: the global color
  * table is the 256-gray ramp (i,i,i), so a pixel's palette index IS its
  * integer luma — which lets the same md5-pixel oracles that gate the
  * BMP/PPM path gate the LZW round trip bit-for-bit (a code-width,
  * bit-packing, sub-block, or table-rebuild defect diverges the decoded
  * lumas and fails the driver's hash compare).
  *
  * Implemented surface: header + logical screen descriptor, global color
  * table, multiple image descriptors (animated multi-frame), LZW with
  * initial code size 8 (CLEAR=256, EOI=257), LSB-first bit packing,
  * 255-byte sub-blocks, width growth 9→12 with table reset at 4096, the
  * KwKwK case, and extension-block skipping on decode. Interlace and
  * local color tables are rejected loudly. */
object GifCodec {

  private val MinCodeSize = 8
  private val Clear = 256
  private val Eoi = 257
  private val MaxTable = 4096

  // ------------------------------------------------------------- encode --

  /** LZW-compress one frame's palette indices (greedy longest-match). */
  private def lzwEncode(indices: Array[Int]): Array[Byte] = {
    val bits = new BitWriter
    var dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int] // (prefixCode, sym) -> code
    var next = Eoi + 1
    var width = MinCodeSize + 1
    bits.put(Clear, width)
    var cur = -1
    indices.foreach { sym =>
      if (cur < 0) cur = sym
      else dict.get((cur, sym)) match {
        case Some(code) => cur = code
        case None =>
          bits.put(cur, width)
          dict((cur, sym)) = next
          next += 1
          if (next > (1 << width) && width < 12) width += 1
          // next == MaxTable ⇒ the just-assigned code was 4095 (the last
          // 12-bit value); assigning 4096 would need 13 bits, so CLEAR now
          if (next >= MaxTable) {
            bits.put(Clear, width)
            dict = scala.collection.mutable.HashMap.empty
            next = Eoi + 1
            width = MinCodeSize + 1
          }
          cur = sym
      }
    }
    if (cur >= 0) bits.put(cur, width)
    bits.put(Eoi, width)
    bits.result()
  }

  private final class BitWriter {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var acc = 0L
    private var nbits = 0
    def put(code: Int, width: Int): Unit = {
      acc |= code.toLong << nbits // LSB-first
      nbits += width
      while (nbits >= 8) {
        out += (acc & 0xff).toByte
        acc >>>= 8
        nbits -= 8
      }
    }
    def result(): Array[Byte] = {
      if (nbits > 0) out += (acc & 0xff).toByte
      out.toArray
    }
  }

  // little-endian helpers shared with the sibling codecs (one definition)
  private def le16(v: Int): Array[Byte] = ImageCodec.le16(v)
  private def rdLe16(b: Array[Byte], o: Int): Int = ImageCodec.rdLe16(b, o)

  /** Encode frames (all same geometry) as one animated grayscale GIF89a:
    * palette index of pixel i = luma(i). */
  def encodeGif(frames: Seq[ImageCodec.Image]): Array[Byte] = {
    require(frames.nonEmpty, "GIF: need at least one frame")
    val w = frames.head.width; val h = frames.head.height
    require(frames.forall(f => f.width == w && f.height == h),
      "GIF: frames must share geometry")
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out ++= "GIF89a".getBytes("US-ASCII")
    out ++= le16(w); out ++= le16(h)
    out += 0xf7.toByte // GCT present, 8-bit color res, 256 entries
    out += 0; out += 0 // background index, aspect
    (0 until 256).foreach { i => out += i.toByte; out += i.toByte; out += i.toByte }
    frames.foreach { f =>
      out += 0x2c // image descriptor
      out ++= le16(0); out ++= le16(0); out ++= le16(w); out ++= le16(h)
      out += 0 // no local table, not interlaced
      out += MinCodeSize.toByte
      val data = lzwEncode(Array.tabulate(w * h)(f.luma))
      var off = 0
      while (off < data.length) {
        val n = math.min(255, data.length - off)
        out += n.toByte
        out ++= data.slice(off, off + n)
        off += n
      }
      out += 0 // block terminator
    }
    out += 0x3b // trailer
    out.toArray
  }

  // ------------------------------------------------------------- decode --

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var acc = 0L
    private var nbits = 0
    def get(width: Int): Int = {
      while (nbits < width) {
        require(pos < data.length, "GIF: LZW stream truncated")
        acc |= (data(pos) & 0xffL) << nbits
        pos += 1
        nbits += 8
      }
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>>= width
      nbits -= width
      v
    }
  }

  private def lzwDecode(data: Array[Byte], nPixels: Int): Array[Int] = {
    val bits = new BitReader(data)
    val out = new Array[Int](nPixels)
    var outPos = 0
    // table entries as (prefix code, final symbol); roots are implicit
    var prefix = new Array[Int](MaxTable)
    var symbol = new Array[Int](MaxTable)
    var next = Eoi + 1
    var width = MinCodeSize + 1
    var prev = -1
    def expand(code: Int): Array[Int] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
      var c = code
      while (c >= Eoi + 1) { buf += symbol(c); c = prefix(c) }
      buf += c
      buf.reverseIterator.toArray
    }
    var done = false
    while (!done) {
      val code = bits.get(width)
      if (code == Clear) {
        next = Eoi + 1; width = MinCodeSize + 1; prev = -1
      } else if (code == Eoi) {
        done = true
      } else {
        require(code < next || (code == next && prev >= 0),
          s"GIF: code $code out of range (next=$next)")
        val entry: Array[Int] =
          if (code < Clear) Array(code)
          else if (code < next) expand(code)
          else { // KwKwK: prev + first(prev)
            val p = if (prev < Clear) Array(prev) else expand(prev)
            p :+ p.head
          }
        entry.foreach { v =>
          require(outPos < nPixels, "GIF: more pixels than geometry")
          out(outPos) = v; outPos += 1
        }
        if (prev >= 0 && next < MaxTable) {
          prefix(next) = prev; symbol(next) = entry.head
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    require(outPos == nPixels, s"GIF: decoded $outPos of $nPixels pixels")
    out
  }

  /** Parse an animated grayscale GIF: every frame as an Image whose three
    * channels equal the palette entry (gray ramp ⇒ channel = index).
    * Returns (frames, total byte length). */
  def decodeGif(bytes: Array[Byte], off: Int = 0): (Seq[ImageCodec.Image], Int) = {
    require(bytes.length >= off + 13, "GIF: truncated header")
    val magic = new String(bytes, off, 6, "US-ASCII")
    require(magic == "GIF89a" || magic == "GIF87a", s"GIF: bad magic $magic")
    val w = rdLe16(bytes, off + 6); val h = rdLe16(bytes, off + 8)
    val packed = bytes(off + 10) & 0xff
    require((packed & 0x80) != 0, "GIF: global color table required")
    val gctSize = 2 << (packed & 7)
    require(bytes.length >= off + 13 + 3 * gctSize, "GIF: truncated color table")
    var p = off + 13
    // every forward step fails loudly on truncation (r14 review: the walk
    // otherwise escaped as ArrayIndexOutOfBounds, not the documented
    // IllegalArgumentException the other parsers throw)
    def byteAt(i: Int): Int = {
      require(i < bytes.length, s"GIF: truncated at $i")
      bytes(i) & 0xff
    }
    // Read ALL THREE palette channels (ADVICE r14: taking only the red
    // byte silently mis-decoded any non-gray palette — a best-effort
    // decode this module's contract forbids). Our encoder writes the
    // gray ramp, so gray inputs decode identically to before; a color
    // palette now decodes to its true per-channel values.
    val gctR = new Array[Int](gctSize)
    val gctG = new Array[Int](gctSize)
    val gctB = new Array[Int](gctSize)
    (0 until gctSize).foreach { i =>
      gctR(i) = bytes(p) & 0xff
      gctG(i) = bytes(p + 1) & 0xff
      gctB(i) = bytes(p + 2) & 0xff
      p += 3
    }
    val frames = Seq.newBuilder[ImageCodec.Image]
    var done = false
    while (!done) {
      byteAt(p) match {
        case 0x3b => done = true; p += 1
        case 0x21 => // extension: label + sub-blocks, skip
          p += 2
          while (byteAt(p) != 0) p += 1 + byteAt(p)
          p += 1
        case 0x2c =>
          require(bytes.length >= p + 11, "GIF: truncated image descriptor")
          val fw = rdLe16(bytes, p + 5); val fh = rdLe16(bytes, p + 7)
          val fpacked = bytes(p + 9) & 0xff
          require((fpacked & 0x80) == 0, "GIF: local color tables unsupported")
          require((fpacked & 0x40) == 0, "GIF: interlace unsupported")
          require(fw == w && fh == h, "GIF: sub-rectangle frames unsupported")
          p += 10
          val mcs = byteAt(p)
          require(mcs == MinCodeSize, s"GIF: unexpected min code size $mcs")
          p += 1
          val data = scala.collection.mutable.ArrayBuffer.empty[Byte]
          while (byteAt(p) != 0) {
            val n = byteAt(p)
            require(bytes.length >= p + 1 + n, "GIF: truncated sub-block")
            data ++= bytes.slice(p + 1, p + 1 + n)
            p += 1 + n
          }
          p += 1
          val idx = lzwDecode(data.toArray, w * h)
          frames += ImageCodec.Image(w, h, idx.map(gctR), idx.map(gctG), idx.map(gctB))
        case other =>
          throw new IllegalArgumentException(f"GIF: unknown block 0x$other%02x at $p")
      }
    }
    (frames.result(), p - off)
  }
}
