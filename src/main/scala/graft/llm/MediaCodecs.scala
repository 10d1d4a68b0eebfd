package graft.llm

/** Pure-JVM codecs for the multimodal pipeline: real byte-level encode /
  * decode for the formats that need no external library — BMP
  * (uncompressed image), PCM WAV (audio), PNG (zlib + CRC32 chunk
  * structure, both in java.util.zip), and JPEG geometry (marker-segment
  * walk to the SOF frame header — the standard header-only probe; full
  * pixel decode would need a codec library). These replace the
  * deterministic stub for payloads carrying their magic; remaining
  * formats (MP3/MP4...) still fall back to [[Multimodal.FakeDecoder]],
  * the documented stub seam where a JNI codec would plug in.
  *
  * Everything here is partition-local per-row byte work — no shuffle,
  * no driver involvement — so it composes into the batched
  * `mapPartitions` decode at any scale.
  */
object MediaCodecs {

  // ---- little-endian primitives ----
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def rdLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def rdLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** BMP pixel rows are padded to 4-byte boundaries (24bpp). */
  def bmpRowBytes(width: Int): Int = (width * 3 + 3) / 4 * 4

  /** Encode a minimal valid 24bpp BMP: 14-byte file header + 40-byte
    * BITMAPINFOHEADER + pixel array of constant `fill` bytes (every
    * channel = fill, so the decoded-pixel checksum has the closed form
    * 3·w·h·fill mod 997 an arithmetic oracle can recompute). Size is
    * independent of fill. */
  def encodeBmp(width: Int, height: Int, fill: Int = 0): Array[Byte] = {
    val pix = bmpRowBytes(width) * height
    val size = 54 + pix
    val out = new java.io.ByteArrayOutputStream(size)
    out.write('B'); out.write('M')
    out.write(le32(size)); out.write(le32(0)); out.write(le32(54))
    out.write(le32(40)) // BITMAPINFOHEADER
    out.write(le32(width)); out.write(le32(height))
    out.write(le16(1)) // planes
    out.write(le16(24)) // bpp
    out.write(le32(0)) // BI_RGB
    out.write(le32(pix)); out.write(le32(2835)); out.write(le32(2835))
    out.write(le32(0)); out.write(le32(0))
    val arr = new Array[Byte](pix)
    if (fill != 0) java.util.Arrays.fill(arr, fill.toByte)
    out.write(arr)
    out.toByteArray
  }

  /** Decode BMP header → (width, height); None when not a BMP.
    * Negative height means top-down row order — geometry is |height|. */
  def decodeBmp(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 54 && b(0) == 'B' && b(1) == 'M')
      Some((rdLe32(b, 18), math.abs(rdLe32(b, 22))))
    else None

  /** Encode a PCM WAV: RIFF header + fmt chunk + data chunk of 16-bit
    * samples whose bytes are all `fill` (sample checksum closed form:
    * nSamples·channels·2·fill mod 997; size independent of fill). */
  def encodeWav(sampleRate: Int, channels: Int, nSamples: Int,
                fill: Int = 0): Array[Byte] = {
    val block = channels * 2 // 16-bit
    val data = nSamples * block
    val out = new java.io.ByteArrayOutputStream(44 + data)
    out.write("RIFF".getBytes); out.write(le32(36 + data))
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); out.write(le32(16))
    out.write(le16(1)) // PCM
    out.write(le16(channels)); out.write(le32(sampleRate))
    out.write(le32(sampleRate * block)) // byte rate
    out.write(le16(block)); out.write(le16(16))
    out.write("data".getBytes); out.write(le32(data))
    val arr = new Array[Byte](data)
    if (fill != 0) java.util.Arrays.fill(arr, fill.toByte)
    out.write(arr)
    out.toByteArray
  }

  /** Decode WAV → (sampleRate, channels, nSamples); None when not a
    * RIFF/WAVE. Walks the chunk list (fmt / data may come in any order
    * and other chunks may intervene), like a real parser must. */
  def decodeWav(b: Array[Byte]): Option[(Int, Int, Int)] = {
    def tag(off: Int, s: String): Boolean =
      off + 4 <= b.length && s.indices.forall(i => b(off + i) == s(i).toByte)
    if (!(tag(0, "RIFF") && tag(8, "WAVE"))) return None
    var off = 12
    var rate = -1; var channels = -1; var bits = 16; var dataLen = -1
    while (off + 8 <= b.length && (rate < 0 || dataLen < 0)) {
      val size = rdLe32(b, off + 4)
      if (tag(off, "fmt ") && off + 8 + 16 <= b.length) {
        channels = rdLe16(b, off + 10)
        rate = rdLe32(b, off + 12)
        bits = rdLe16(b, off + 22)
      } else if (tag(off, "data")) {
        dataLen = size
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (rate <= 0 || channels <= 0 || dataLen < 0) None
    else Some((rate, channels, dataLen / (channels * math.max(bits / 8, 1))))
  }

  /** Encode an AIFF: FORM/AIFF container with COMM (channels, frame
    * count, 16-bit samples, sample rate as the 80-bit extended float
    * the format mandates) and SSND (offset/block 0 + sample bytes of
    * constant `fill` — same closed-form checksum as WAV:
    * nFrames·channels·2·fill mod 997). Big-endian throughout. */
  def encodeAiff(sampleRate: Int, channels: Int, nFrames: Int,
                 fill: Int = 0): Array[Byte] = {
    val data = nFrames * channels * 2
    val out = new java.io.ByteArrayOutputStream(54 + data)
    out.write("FORM".getBytes); out.write(be32(4 + 26 + 16 + data))
    out.write("AIFF".getBytes)
    out.write("COMM".getBytes); out.write(be32(18))
    out.write(be16(channels)); out.write(be32(nFrames))
    out.write(be16(16)) // bits per sample
    out.write(ext80(sampleRate))
    out.write("SSND".getBytes); out.write(be32(8 + data))
    out.write(be32(0)); out.write(be32(0)) // offset, block size
    val arr = new Array[Byte](data)
    if (fill != 0) java.util.Arrays.fill(arr, fill.toByte)
    out.write(arr)
    out.toByteArray
  }

  /** 80-bit IEEE 754 extended float of a positive integer (the COMM
    * sample-rate field): 15-bit biased exponent + explicit-leading-one
    * 64-bit mantissa. */
  private def ext80(v: Int): Array[Byte] = {
    require(v > 0, "ext80 encodes positive rates")
    val h = 31 - Integer.numberOfLeadingZeros(v) // highest set bit
    val exp = 16383 + h
    val mant = v.toLong << (63 - h)
    Array(((exp >> 8) & 0xff).toByte, (exp & 0xff).toByte) ++
      (0 until 8).map(i => ((mant >>> (56 - 8 * i)) & 0xff).toByte)
  }

  private def rdExt80(b: Array[Byte], off: Int): Int = {
    val exp = ((b(off) & 0x7f) << 8) | (b(off + 1) & 0xff)
    var mant = 0L
    var i = 0
    while (i < 8) { mant = (mant << 8) | (b(off + 2 + i) & 0xff); i += 1 }
    val shift = 63 - (exp - 16383)
    if (shift < 0 || shift > 62 || mant == 0) -1
    else (mant >>> shift).toInt
  }

  /** Decode AIFF → (sampleRate, channels, nFrames); None when not a
    * FORM/AIFF. Walks the chunk list to COMM (chunks are word-aligned,
    * any order, others skipped) and decodes the 80-bit extended rate. */
  def decodeAiff(b: Array[Byte]): Option[(Int, Int, Int)] = {
    def tag(off: Int, s: String): Boolean =
      off + 4 <= b.length && s.indices.forall(i => b(off + i) == s(i).toByte)
    if (!(tag(0, "FORM") && tag(8, "AIFF"))) return None
    var off = 12
    while (off + 8 <= b.length) {
      val size = rdBe32(b, off + 4)
      if (tag(off, "COMM") && size >= 18 && off + 8 + 18 <= b.length) {
        val channels = rdBe16(b, off + 8)
        val frames = rdBe32(b, off + 10)
        val rate = rdExt80(b, off + 16)
        return if (rate > 0 && channels > 0) Some((rate, channels, frames))
        else None
      }
      off += 8 + size + (size & 1)
    }
    None
  }

  // ---- big-endian primitives (PNG/JPEG are network byte order) ----
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def rdBe16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def rdBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private val PngSig: Array[Int] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** zlib stream of `raw` as ONE stored (uncompressed) deflate block —
    * hand-rolled so the byte length is exactly `raw.length + 11`
    * (2 header + 5 block framing + data + 4 Adler-32), a closed form an
    * arithmetic oracle can reproduce. Valid input for any inflater.
    * Single-block framing caps raw at 65535 bytes (fixture-sized). */
  private def zlibStored(raw: Array[Byte]): Array[Byte] = {
    require(raw.length <= 0xffff, "single stored block caps at 65535")
    val out = new java.io.ByteArrayOutputStream(raw.length + 11)
    out.write(0x78); out.write(0x01) // CMF/FLG, 32K window, check bits ok
    out.write(0x01) // BFINAL=1, BTYPE=00 (stored)
    out.write(le16(raw.length)); out.write(le16(raw.length ^ 0xffff))
    out.write(raw)
    val adler = new java.util.zip.Adler32
    adler.update(raw)
    out.write(be32(adler.getValue.toInt))
    out.toByteArray
  }

  private def pngChunk(out: java.io.ByteArrayOutputStream,
                       typ: String, data: Array[Byte]): Unit = {
    out.write(be32(data.length))
    val tb = typ.getBytes("US-ASCII")
    out.write(tb)
    out.write(data)
    val crc = new java.util.zip.CRC32
    crc.update(tb); crc.update(data)
    out.write(be32(crc.getValue.toInt))
  }

  /** Encode a REAL (inflater-valid) PNG: signature, IHDR, one IDAT of
    * 8-bit grayscale scanlines (filter byte 0 per row, every gray value
    * = `fill` — decoded via gray→RGB expansion the pixel checksum is
    * 3·w·h·fill mod 997) in a stored-block zlib stream, IEND. Total
    * size is the closed form 68 + height·(width+1), fill-independent. */
  def encodePng(width: Int, height: Int, fill: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(68 + height * (width + 1))
    PngSig.foreach(out.write)
    val ihdr = new java.io.ByteArrayOutputStream(13)
    ihdr.write(be32(width)); ihdr.write(be32(height))
    ihdr.write(8) // bit depth
    ihdr.write(0) // grayscale
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate/adaptive/none
    pngChunk(out, "IHDR", ihdr.toByteArray)
    val raw = new Array[Byte](height * (width + 1))
    if (fill != 0) {
      var y = 0
      while (y < height) { // byte 0 of each scanline is the filter type
        java.util.Arrays.fill(raw, y * (width + 1) + 1,
          (y + 1) * (width + 1), fill.toByte)
        y += 1
      }
    }
    pngChunk(out, "IDAT", zlibStored(raw))
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode PNG header → (width, height); None when not a PNG. The IHDR
    * chunk is required first by the spec, so the walk is a fixed-offset
    * read after the signature. */
  def decodePng(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 && PngSig.indices.forall(i =>
        (b(i) & 0xff) == PngSig(i)) &&
        "IHDR".indices.forall(i => b(12 + i) == "IHDR".charAt(i).toByte)) {
      val (w, h) = (rdBe32(b, 16), rdBe32(b, 20))
      if (w > 0 && h > 0) Some((w, h)) else None
    } else None

  private def jpegSeg(out: java.io.ByteArrayOutputStream,
                      marker: Int, data: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    out.write(be16(data.length + 2))
    out.write(data)
  }

  /** Encode a JPEG geometry fixture: SOI, JFIF APP0, SOF0 frame header
    * carrying (height, width, 1 grayscale component), EOI — the marker
    * structure a header prober walks, 35 bytes total. Entropy-coded
    * data (DQT/DHT/SOS) is omitted: generating it needs a real
    * compressor, and [[decodeJpeg]]-style geometry probes never read
    * it. */
  def encodeJpeg(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(35)
    out.write(0xff); out.write(0xd8) // SOI
    val jfif = new java.io.ByteArrayOutputStream(14)
    jfif.write("JFIF".getBytes("US-ASCII")); jfif.write(0)
    jfif.write(1); jfif.write(2) // version 1.2
    jfif.write(0) // aspect-ratio units
    jfif.write(be16(1)); jfif.write(be16(1)) // density 1:1
    jfif.write(0); jfif.write(0) // no thumbnail
    jpegSeg(out, 0xe0, jfif.toByteArray)
    val sof = new java.io.ByteArrayOutputStream(9)
    sof.write(8) // precision
    sof.write(be16(height)); sof.write(be16(width))
    sof.write(1) // one component
    sof.write(1); sof.write(0x11); sof.write(0) // id, 1x1 sampling, qtable
    jpegSeg(out, 0xc0, sof.toByteArray)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  private val GifMagics = Seq("GIF87a", "GIF89a")

  /** Encode a minimal GIF89a: header, logical screen descriptor
    * (width/height LE16, no global color table), trailer. 14 bytes. */
  def encodeGif(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(14)
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(le16(width)); out.write(le16(height))
    out.write(0); out.write(0); out.write(0) // no GCT, bg 0, square pixels
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decode GIF logical-screen geometry → (width, height). */
  def decodeGif(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 10 && GifMagics.exists(m =>
        m.indices.forall(i => b(i) == m.charAt(i).toByte))) {
      val (w, h) = (rdLe16(b, 6), rdLe16(b, 8))
      if (w > 0 && h > 0) Some((w, h)) else None
    } else None

  /** Fixed encode bitrate for the MP3 fixture (128 kbps, MPEG-1 L3
    * bitrate index 9). */
  val Mp3Bitrate = 128000
  private val Mp3Bitrates = // MPEG-1 Layer III, bps (0 = free, 15 = bad)
    Array(0, 32000, 40000, 48000, 56000, 64000, 80000, 96000, 112000,
      128000, 160000, 192000, 224000, 256000, 320000)
  private val Mp3Rates = Array(44100, 48000, 32000)

  /** MPEG-1 Layer III frame length at padding 0: 144·bitrate/rate. */
  def mp3FrameLen(sampleRate: Int, bitrate: Int = Mp3Bitrate): Int =
    144 * bitrate / sampleRate

  /** Encode an MP3 fixture: `nFrames` valid MPEG-1 Layer III frame
    * headers (sync, version, layer, bitrate 128k, rate, channel mode)
    * each followed by its zeroed frame payload — a real frame sequence
    * a walker must step through. `sampleRate` ∈ {44100, 48000, 32000}. */
  def encodeMp3(sampleRate: Int, channels: Int, nFrames: Int): Array[Byte] = {
    val rateIdx = Mp3Rates.indexOf(sampleRate)
    require(rateIdx >= 0, s"unsupported MPEG-1 rate $sampleRate")
    val flen = mp3FrameLen(sampleRate)
    val out = new java.io.ByteArrayOutputStream(nFrames * flen)
    for (_ <- 0 until nFrames) {
      out.write(0xff)
      out.write(0xfb) // sync + MPEG-1 + Layer III + no CRC
      out.write((9 << 4) | (rateIdx << 2)) // bitrate idx 9, padding 0
      out.write((if (channels == 1) 3 else 0) << 6) // mono / stereo
      out.write(new Array[Byte](flen - 4))
    }
    out.toByteArray
  }

  /** Decode MP3 → (sampleRate, channels, nFrames) by WALKING the frame
    * sequence: each header's bitrate/rate indexes give that frame's
    * length, the walk steps to the next sync. A byte stream that stops
    * mid-frame or loses sync is rejected. */
  def decodeMp3(b: Array[Byte]): Option[(Int, Int, Int)] = {
    var off = 0
    var rate = -1; var channels = -1; var frames = 0
    while (off + 4 <= b.length) {
      if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xe0) != 0xe0)
        return None // lost sync
      val version = (b(off + 1) >> 3) & 3
      val layer = (b(off + 1) >> 1) & 3
      if (version != 3 || layer != 1) return None // MPEG-1 Layer III only
      val brIdx = (b(off + 2) >> 4) & 15
      val rateIdx = (b(off + 2) >> 2) & 3
      // index 15 = "bad", 0 = free-format, 3 = reserved rate — reject
      // rather than crash on the table lookup
      if (brIdx == 0 || brIdx == 15 || rateIdx == 3) return None
      val bitrate = Mp3Bitrates(brIdx)
      val padding = (b(off + 2) >> 1) & 1
      val r = Mp3Rates(rateIdx)
      val ch = if (((b(off + 3) >> 6) & 3) == 3) 1 else 2
      if (rate < 0) { rate = r; channels = ch }
      frames += 1
      off += mp3FrameLen(r, bitrate) + padding
    }
    if (frames > 0 && off == b.length) Some((rate, channels, frames))
    else None
  }

  /** Decode MP4 geometry → (width, height) by walking the ISO-BMFF box
    * tree (BE32 size + 4CC) to moov → trak → tkhd and reading the
    * 16.16 fixed-point width/height at the v0 layout offsets. */
  def decodeMp4(b: Array[Byte]): Option[(Int, Int)] = {
    def boxAt(off: Int, limit: Int): Option[(String, Int, Int)] =
      if (off + 8 > limit) None
      else {
        val size = rdBe32(b, off)
        if (size < 8 || off + size > limit) None
        else Some((new String(b, off + 4, 4, "US-ASCII"), off + 8, off + size))
      }
    def walk(off: Int, limit: Int, path: List[String]): Option[(Int, Int)] =
      boxAt(off, limit) match {
        case None => None
        case Some((typ, dataStart, end)) =>
          val found = (typ, path) match {
            case ("tkhd", "trak" :: "moov" :: _) =>
              // v0 tkhd: width/height at data offsets 76/80, 16.16 fixed
              if (end - dataStart >= 84 && b(dataStart) == 0)
                Some((rdBe32(b, dataStart + 76) >>> 16,
                  rdBe32(b, dataStart + 80) >>> 16))
              else None
            case ("moov", _) | ("trak", _) =>
              walk(dataStart, end, typ :: path)
            case _ => None
          }
          found.orElse(walk(end, limit, path))
      }
    // a real MP4 leads with ftyp
    boxAt(0, b.length) match {
      case Some(("ftyp", _, _)) =>
        walk(0, b.length, Nil).filter { case (w, h) => w > 0 && h > 0 }
      case _ => None
    }
  }

  /** Encode an MP4 geometry fixture: ftyp(isom) + moov/trak/tkhd with
    * the 16.16 width/height — the box path [[decodeMp4]] walks.
    * 124 bytes; sample data (mdat/stbl) omitted, as for JPEG. */
  def encodeMp4(width: Int, height: Int): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8) ++ typ.getBytes("US-ASCII") ++ payload
    val tkhd = new Array[Byte](84)
    System.arraycopy(be32(width << 16), 0, tkhd, 76, 4)
    System.arraycopy(be32(height << 16), 0, tkhd, 80, 4)
    box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++
      box("moov", box("trak", box("tkhd", tkhd)))
  }

  /** SOF0-SOF15 minus DHT(C4)/JPG(C8)/DAC(CC) — the frame headers that
    * carry geometry. */
  private def isSofMarker(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  // ---- real pixel/sample decode (JDK standard library, zero new deps) --
  // javax.imageio reads the actual raster for PNG/JPEG/GIF/BMP;
  // javax.sound.sampled reads the actual PCM frames for WAV/AIFF. These
  // close the content half of the decode seam: features below derive
  // from decoded pixel/sample DATA, not header fields. Disk caching off —
  // every payload is an in-memory byte array; a temp-file cache per call
  // would turn a map-only operator into per-row disk IO.
  javax.imageio.ImageIO.setUseCache(false)

  /** Checksum over decoded pixel content: sum of the 8-bit R+G+B
    * channels over all pixels, row-major, mod 997 (the same modulus as
    * the byte checksum). Grayscale images expand gray→(g,g,g) by RAW
    * raster sample — `getRGB` would run the linear-gray→sRGB gamma
    * conversion (gray 1 becomes 13) and destroy the arithmetic closed
    * form — so a constant-fill image of any supported color model
    * checksums to 3·w·h·fill mod 997. Indexed (palette) and direct-RGB
    * models go through `getRGB`, an identity for sRGB data. */
  def pixelChecksum(img: java.awt.image.BufferedImage): Long = {
    val gray = img.getColorModel match {
      case _: java.awt.image.IndexColorModel => false // sample = palette index
      case cm => cm.getColorSpace.getType == java.awt.color.ColorSpace.TYPE_GRAY
    }
    val raster = img.getRaster
    var cs = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val v =
          if (gray) 3 * raster.getSample(x, y, 0)
          else {
            val rgb = img.getRGB(x, y)
            ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          }
        cs = (cs + v) % 997
        x += 1
      }
      y += 1
    }
    cs
  }

  /** ImageIO's ImageInputStream defaults to a DISK-backed cache — a
    * temp file per decode, which costs ~5× single-thread and caps
    * concurrent scaling (ImageDecodeProbe: 32 threads at 39k decodes/s
    * with the cache vs 388k/s without — the javax.sound lock's little
    * sibling). In-memory byte-array decodes never need it; disabled
    * once, process-wide, before the first decode. */
  private lazy val imageIoNoCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** All ImageIO decodes route through here: cache disabled (see
    * [[imageIoNoCache]]), null when no reader accepts the bytes. */
  def readImage(b: Array[Byte]): java.awt.image.BufferedImage = {
    imageIoNoCache
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    catch { case _: Exception => null }
  }

  /** REAL image decode via the JDK's ImageIO: full raster read →
    * (width, height, pixelChecksum). None when no reader accepts the
    * bytes — geometry-only fixtures (JPEG without scan data, GIF
    * without an image descriptor) land here and keep their header-walk
    * geometry with no pixel evidence. */
  def decodeImagePixels(b: Array[Byte]): Option[(Int, Int, Long)] = {
    val img = readImage(b)
    if (img == null) None
    else Some((img.getWidth, img.getHeight, pixelChecksum(img)))
  }

  /** REAL pixel resample via the JDK: ImageIO decode → bilinear
    * `Graphics2D.drawImage` into an RGB target of (outW, outH) →
    * checksum of the RESIZED raster. Palette (GIF) and gray sources
    * convert to RGB through the draw, so the checksum is always the
    * RGB-sum form. Constant-color sources stay constant under any
    * interpolation — the closed form 3·outW·outH·fill survives the
    * resample, which is what makes the operator oracle-comparable on
    * the synthetic fixtures (gradient content is pinned by CodecSpec
    * instead). None when the bytes aren't a decodable image. */
  def resizeImagePixels(b: Array[Byte], outW: Int,
                        outH: Int): Option[Long] = {
    val img = readImage(b)
    if (img == null || outW < 1 || outH < 1) None
    else {
      val dst = new java.awt.image.BufferedImage(
        outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, outW, outH, null)
      } finally g.dispose()
      Some(pixelChecksum(dst))
    }
  }

  /** REAL audio sample decode via javax.sound.sampled: stream the PCM
    * frames and checksum the sample bytes mod 997 (constant-fill data
    * chunk → nBytes·fill mod 997). None when the byte stream isn't a
    * supported audio file. */
  def decodeWavSamples(b: Array[Byte]): Option[Long] =
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(b))
      try {
        val buf = new Array[Byte](8192)
        var cs = 0L
        var n = ais.read(buf)
        while (n > 0) {
          var i = 0
          while (i < n) { cs = (cs + (buf(i) & 0xff)) % 997; i += 1 }
          n = ais.read(buf)
        }
        Some(cs)
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Deterministic full-color test image: channel values are fixed
    * affine functions of (x, y, seed) — non-constant in both axes, so a
    * decoder that reads only part of the raster cannot reproduce the
    * checksum. */
  def renderImage(width: Int, height: Int,
                  seed: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = (x * 7 + y * 13 + seed) & 0xff
        val g = (x * 3 + y * 5 + seed * 11) & 0xff
        val bl = (x * 17 + y + seed * 29) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | bl)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Constant-color image (every channel = fill) — the oracle-friendly
    * input: lossless formats round-trip it exactly, so the decoded
    * pixel checksum keeps the 3·w·h·fill closed form. */
  def renderConstImage(width: Int, height: Int,
                       fill: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (fill << 16) | (fill << 8) | fill
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    img
  }

  /** Encode via the JDK's ImageIO writers ("png", "jpg", "gif", "bmp"):
    * a REAL compressed file — LZW for GIF, DCT entropy coding for JPEG —
    * that any standard decoder reads. Unlike the hand-rolled encoders
    * the byte size has no closed form, so oracle queries over these
    * payloads compare geometry and pixel checksums, not n_bytes. */
  def encodeImageIO(img: java.awt.image.BufferedImage,
                    format: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, format, out)
    require(ok, s"no ImageIO writer for format $format")
    out.toByteArray
  }

  /** Real LZW-compressed GIF of a constant-color image. GIF is
    * palette-lossless: one distinct color → exact round-trip → pixel
    * checksum keeps the 3·w·h·fill mod 997 closed form. */
  def encodeGifReal(width: Int, height: Int, fill: Int): Array[Byte] =
    encodeImageIO(renderConstImage(width, height, fill), "gif")

  /** Real entropy-coded JPEG of the deterministic gradient image. Lossy:
    * pixel values are NOT oracle-recomputable; determinism is pinned by
    * CodecSpec (same input bytes → same decoded raster in one JVM). */
  def encodeJpegReal(width: Int, height: Int, seed: Int): Array[Byte] =
    encodeImageIO(renderImage(width, height, seed), "jpg")

  /** Integer gray level of one pixel: (r + g + b) / 3 with integer
    * division — the exact form an arithmetic SQL oracle can replay. */
  def grayAt(img: java.awt.image.BufferedImage, x: Int, y: Int): Int = {
    val rgb = img.getRGB(x, y)
    (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
  }

  /** 64-bit difference hash (dHash) of a decoded raster — the standard
    * perceptual image fingerprint: sample a 9×8 gray grid, compare each
    * horizontally adjacent pair, pack the 8×8 comparison bits into a
    * long (bit gy*8+gx = 1 iff gray(gx+1,gy) > gray(gx,gy)). Visually
    * identical images (same content re-encoded in another lossless
    * format, or with a few pixels touched) land within a small hamming
    * distance, so near-duplicate detection is a banded hamming
    * self-join over these signatures — the same machinery as SimHash
    * text dedup, with 4×16-bit bands instead of 4×15.
    *
    * Downsampling is NEAREST-NEIGHBOR point sampling (source pixel
    * (gx*w/9, gy*h/8), integer division) rather than area averaging —
    * deliberately: every sampled gray is a single decoded pixel value,
    * so the whole signature is integer arithmetic over raster content
    * and an SQL oracle replays it exactly on synthetic fixtures. Area
    * averaging is slightly more robust to high-frequency noise but
    * makes the signature a float function of every pixel; for the
    * re-encode / small-edit near-dup classes targeted here the point
    * sample is equally discriminative. */
  def dhash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    var sig = 0L
    var gy = 0
    while (gy < 8) {
      val sy = gy * h / 8
      var prev = grayAt(img, 0, sy) // gx=0 → sx = 0*w/9 = 0
      var gx = 0
      while (gx < 8) {
        val next = grayAt(img, (gx + 1) * w / 9, sy)
        if (next > prev) sig |= 1L << (gy * 8 + gx)
        prev = next
        gx += 1
      }
      gy += 1
    }
    sig
  }

  // ---- audio fingerprint (the dHash idea on the time axis) ----------

  /** Encode a MONO 16-bit PCM WAV carrying REAL sample content
    * (little-endian data chunk) — the content-bearing twin of
    * [[encodeWav]]'s constant-fill fixture. Samples are 16-bit signed. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val data = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + data)
    out.write("RIFF".getBytes); out.write(le32(36 + data))
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); out.write(le32(16))
    out.write(le16(1)); out.write(le16(1)); out.write(le32(sampleRate))
    out.write(le32(sampleRate * 2)); out.write(le16(2)); out.write(le16(16))
    out.write("data".getBytes); out.write(le32(data))
    samples.foreach(s => out.write(le16(s & 0xffff)))
    out.toByteArray
  }

  /** Encode a MONO 16-bit PCM AIFF of the same samples (big-endian SSND
    * bytes — the AIFF/WAV pair carries IDENTICAL PCM in two containers,
    * which is what makes cross-format audio dedup a real test: byte
    * hashing cannot match them). */
  def encodeAiffPcm16(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val data = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(54 + data)
    out.write("FORM".getBytes); out.write(be32(4 + 26 + 16 + data))
    out.write("AIFF".getBytes)
    out.write("COMM".getBytes); out.write(be32(18))
    out.write(be16(1)); out.write(be32(samples.length))
    out.write(be16(16)); out.write(ext80(sampleRate))
    out.write("SSND".getBytes); out.write(be32(8 + data))
    out.write(be32(0)); out.write(be32(0))
    samples.foreach(s => out.write(be16(s & 0xffff)))
    out.toByteArray
  }

  /** REAL PCM decode via javax.sound.sampled → channel-0 16-bit signed
    * samples. Handles both endiannesses (WAV is LE, AIFF BE) and any
    * channel count (channel 0 taken per frame). None when the bytes
    * aren't a supported 16-bit PCM audio file. */
  def decodePcm16(b: Array[Byte]): Option[Array[Int]] =
    decodePcm16Fast(b).orElse(decodePcm16Jdk(b))

  /** Contention-free channel-0 16-bit PCM extractor for the two
    * containers this engine gates on (RIFF/WAVE little-endian,
    * FORM/AIFF big-endian) — byte-identical samples to the javax.sound
    * path, without `AudioSystem.getAudioInputStream`: the JDK's
    * provider machinery SERIALIZES concurrent decodes (measured by
    * AudioDecodeProbe — 32 threads deliver 0.7× single-thread
    * throughput), which made the whole audio stack effectively serial
    * under local[32] and superlinear in wall-clock at sf1. Structurally
    * surprising payloads (non-PCM fmt code, ≠16 bits) return None and
    * [[decodePcm16]] falls back to the JDK path. Truncated data chunks
    * clamp to the available bytes, matching the stream reader. */
  def decodePcm16Fast(b: Array[Byte]): Option[Array[Int]] = {
    def tag(off: Int, s: String): Boolean =
      off + 4 <= b.length && s.indices.forall(i => b(off + i) == s(i).toByte)
    if (tag(0, "RIFF") && tag(8, "WAVE")) {
      var off = 12
      var channels = -1; var bits = -1; var fmtCode = -1
      var dataOff = -1; var dataLen = -1
      while (off + 8 <= b.length && (fmtCode < 0 || dataOff < 0)) {
        val size = rdLe32(b, off + 4)
        if (size < 0) return None
        if (tag(off, "fmt ") && off + 8 + 16 <= b.length) {
          fmtCode = rdLe16(b, off + 8)
          channels = rdLe16(b, off + 10)
          bits = rdLe16(b, off + 22)
        } else if (tag(off, "data")) {
          dataOff = off + 8; dataLen = size
        }
        off += 8 + size + (size & 1)
      }
      if (fmtCode != 1 || bits != 16 || channels <= 0 || dataOff < 0)
        return None
      val frameBytes = channels * 2
      val n = math.min(dataLen, b.length - dataOff) / frameBytes
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        val o = dataOff + i * frameBytes
        out(i) = (b(o + 1) << 8) | (b(o) & 0xff)
        i += 1
      }
      Some(out)
    } else if (tag(0, "FORM") && tag(8, "AIFF")) {
      var off = 12
      var channels = -1; var bits = -1; var frames = -1
      var dataOff = -1; var avail = -1
      while (off + 8 <= b.length && (channels < 0 || dataOff < 0)) {
        val size = rdBe32(b, off + 4)
        if (size < 0) return None
        if (tag(off, "COMM") && size >= 18 && off + 8 + 18 <= b.length) {
          channels = rdBe16(b, off + 8)
          frames = rdBe32(b, off + 10)
          bits = rdBe16(b, off + 14)
        } else if (tag(off, "SSND") && off + 16 <= b.length) {
          val ssndOffset = rdBe32(b, off + 8) // bytes before frame 0
          if (ssndOffset < 0) return None
          dataOff = off + 16 + ssndOffset
          avail = math.min(size - 8 - ssndOffset, b.length - dataOff)
        }
        off += 8 + size + (size & 1)
      }
      if (bits != 16 || channels <= 0 || frames < 0 || dataOff < 0)
        return None
      val frameBytes = channels * 2
      val n = math.min(frames, math.max(avail, 0) / frameBytes)
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        val o = dataOff + i * frameBytes
        out(i) = (b(o) << 8) | (b(o + 1) & 0xff)
        i += 1
      }
      Some(out)
    } else None
  }

  /** The javax.sound fallback for containers the fast path doesn't
    * hand-parse — correct but serialized across threads (see
    * [[decodePcm16Fast]]). */
  def decodePcm16Jdk(b: Array[Byte]): Option[Array[Int]] =
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(b))
      try {
        val f = ais.getFormat
        if (f.getSampleSizeInBits != 16 ||
            f.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val frameBytes = f.getFrameSize
          val raw = ais.readAllBytes()
          val n = raw.length / frameBytes
          val outArr = new Array[Int](n)
          var i = 0
          while (i < n) {
            val off = i * frameBytes // channel 0 leads each frame
            outArr(i) =
              if (f.isBigEndian) (raw(off) << 8) | (raw(off + 1) & 0xff)
              else (raw(off + 1) << 8) | (raw(off) & 0xff)
            i += 1
          }
          Some(outArr)
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  /** 64-bit audio fingerprint (aFP) — [[dhash64]]'s construction on the
    * time axis: split the sample stream into 65 equal frames of
    * ⌊n/65⌋ samples, compute each frame's energy (sum of squared
    * samples, exact Long arithmetic), compare adjacent frames and pack
    * the 64 comparison bits (bit f = 1 iff energy(f+1) > energy(f)).
    * The same re-encode (WAV ↔ AIFF, identical PCM → distance 0) and
    * small-edit (one touched sample moves one frame's energy → ≤ 2
    * bits) near-dup classes as the image hash, and the same
    * integer-only math an SQL oracle replays exactly. None when fewer
    * than 65 samples. */
  def afp64(samples: Array[Int]): Option[Long] = {
    val flen = samples.length / 65
    if (flen == 0) return None
    def energy(f: Int): Long = {
      var e = 0L
      var i = f * flen
      val end = i + flen
      while (i < end) { e += samples(i).toLong * samples(i); i += 1 }
      e
    }
    var sig = 0L
    var prev = energy(0)
    var f = 0
    while (f < 64) {
      val next = energy(f + 1)
      if (next > prev) sig |= 1L << f
      prev = next
      f += 1
    }
    Some(sig)
  }

  /** Decode JPEG geometry → (width, height); None when not a JPEG or no
    * SOF before scan data. Walks marker segments from SOI (skipping fill
    * bytes and length-less RST/TEM markers) to the first SOF frame
    * header — the standard header probe, independent of entropy data. */
  def decodeJpeg(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var off = 2
    while (off + 2 <= b.length) {
      if ((b(off) & 0xff) != 0xff) return None
      // fill bytes: any number of 0xff may pad before the marker id
      var p = off + 1
      while (p < b.length && (b(p) & 0xff) == 0xff) p += 1
      if (p >= b.length) return None
      val m = b(p) & 0xff
      off = p + 1
      if (m == 0xd9 || m == 0xda) return None // EOI / SOS: no SOF seen
      if ((m >= 0xd0 && m <= 0xd8) || m == 0x01) {
        // RSTn / SOI / TEM carry no length — nothing to skip
      } else {
        if (off + 2 > b.length) return None
        val len = rdBe16(b, off)
        if (len < 2) return None
        if (isSofMarker(m)) {
          if (off + 7 > b.length) return None
          val h = rdBe16(b, off + 3)
          val w = rdBe16(b, off + 5)
          return if (w > 0 && h > 0) Some((w, h)) else None
        }
        off += len
      }
    }
    None
  }
}
