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
    * BITMAPINFOHEADER + zeroed pixel array. */
  def encodeBmp(width: Int, height: Int): Array[Byte] = {
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
    out.write(new Array[Byte](pix))
    out.toByteArray
  }

  /** Decode BMP header → (width, height); None when not a BMP.
    * Negative height means top-down row order — geometry is |height|. */
  def decodeBmp(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 54 && b(0) == 'B' && b(1) == 'M')
      Some((rdLe32(b, 18), math.abs(rdLe32(b, 22))))
    else None

  /** Encode a PCM WAV: RIFF header + fmt chunk + data chunk of zeroed
    * 16-bit samples. */
  def encodeWav(sampleRate: Int, channels: Int, nSamples: Int): Array[Byte] = {
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
    out.write(new Array[Byte](data))
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
    * zero-filled 8-bit grayscale scanlines (filter byte 0 per row) in a
    * stored-block zlib stream, IEND. Total size is the closed form
    * 68 + height·(width+1). */
  def encodePng(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(68 + height * (width + 1))
    PngSig.foreach(out.write)
    val ihdr = new java.io.ByteArrayOutputStream(13)
    ihdr.write(be32(width)); ihdr.write(be32(height))
    ihdr.write(8) // bit depth
    ihdr.write(0) // grayscale
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate/adaptive/none
    pngChunk(out, "IHDR", ihdr.toByteArray)
    pngChunk(out, "IDAT", zlibStored(new Array[Byte](height * (width + 1))))
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
