package graft.llm

/** Pure-JVM codecs for the multimodal pipeline: real byte-level encode /
  * decode for the two formats that need no external library — BMP
  * (uncompressed image) and PCM WAV (audio). These replace the
  * deterministic stub for payloads carrying their magic; other formats
  * (JPEG/PNG/MP3/MP4...) still fall back to [[Multimodal.FakeDecoder]],
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
}
