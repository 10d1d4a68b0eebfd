package graft

import graft.llm.{MediaCodecs, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {

  test("BMP encode/decode round-trip, incl. padded rows") {
    for ((w, h) <- Seq((1, 1), (3, 2), (16, 12), (640, 480))) {
      val b = MediaCodecs.encodeBmp(w, h)
      assert(MediaCodecs.decodeBmp(b).contains((w, h)))
      assert(b.length == 54 + MediaCodecs.bmpRowBytes(w) * h)
    }
    // top-down BMPs store negative height; geometry is |height|
    val neg = MediaCodecs.encodeBmp(4, 3)
    neg(22) = (-3 & 0xff).toByte; neg(23) = 0xff.toByte
    neg(24) = 0xff.toByte; neg(25) = 0xff.toByte
    assert(MediaCodecs.decodeBmp(neg).contains((4, 3)))
  }

  test("WAV encode/decode round-trip, chunk walking") {
    for ((rate, ch, n) <- Seq((8000, 1, 1), (16000, 2, 255), (44100, 2, 4096))) {
      val b = MediaCodecs.encodeWav(rate, ch, n)
      assert(MediaCodecs.decodeWav(b).contains((rate, ch, n)))
      assert(b.length == 44 + n * ch * 2)
    }
    // a LIST chunk between WAVE and fmt must be skipped, not break parse
    val base = MediaCodecs.encodeWav(22050, 1, 10)
    val extra = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes
    val withChunk = base.slice(0, 12) ++ extra ++ base.drop(12)
    // fix RIFF size field
    val riffSize = withChunk.length - 8
    withChunk(4) = (riffSize & 0xff).toByte
    withChunk(5) = ((riffSize >> 8) & 0xff).toByte
    withChunk(6) = ((riffSize >> 16) & 0xff).toByte
    withChunk(7) = ((riffSize >> 24) & 0xff).toByte
    assert(MediaCodecs.decodeWav(withChunk).contains((22050, 1, 10)))
  }

  test("PNG encode/decode round-trip; stream is inflater-valid") {
    for ((w, h) <- Seq((1, 1), (20, 10), (64, 3))) {
      val b = MediaCodecs.encodePng(w, h)
      assert(MediaCodecs.decodePng(b).contains((w, h)))
      assert(b.length == 68 + h * (w + 1)) // the oracle's closed form
    }
    // the IDAT zlib stream must inflate to the raw scanlines — i.e. the
    // PNG is REAL, not merely header-shaped
    val png = MediaCodecs.encodePng(5, 4)
    val idatLen = ((png(33) & 0xff) << 24) | ((png(34) & 0xff) << 16) |
      ((png(35) & 0xff) << 8) | (png(36) & 0xff)
    val idat = png.slice(41, 41 + idatLen)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat)
    val raw = new Array[Byte](4 * 6 + 16)
    val n = inf.inflate(raw)
    assert(n == 4 * 6) // height * (width + filter byte)
    assert(inf.finished())
    assert(raw.take(n).forall(_ == 0))
  }

  test("JPEG geometry fixture round-trip; SOF walk skips other segments") {
    for ((w, h) <- Seq((1, 1), (30, 14), (1920, 1080))) {
      val b = MediaCodecs.encodeJpeg(w, h)
      assert(b.length == 35)
      assert(MediaCodecs.decodeJpeg(b).contains((w, h)))
    }
    // a COM segment inserted before SOF must be walked over
    val base = MediaCodecs.encodeJpeg(9, 7)
    val com = Array(0xff, 0xfe, 0x00, 0x06).map(_.toByte) ++
      "note".getBytes
    val withCom = base.take(2) ++ com ++ base.drop(2)
    assert(MediaCodecs.decodeJpeg(withCom).contains((9, 7)))
    // truncated before SOF → reject
    assert(MediaCodecs.decodeJpeg(base.take(10)).isEmpty)
  }

  test("GIF encode/decode round-trip") {
    for ((w, h) <- Seq((1, 1), (25, 15), (640, 480))) {
      val b = MediaCodecs.encodeGif(w, h)
      assert(b.length == 14)
      assert(MediaCodecs.decodeGif(b).contains((w, h)))
    }
    assert(MediaCodecs.decodeGif("GIFXYZ1234".getBytes).isEmpty)
  }

  test("MP3 frame walk: counts frames, rejects lost sync / truncation") {
    for ((rate, ch, n) <- Seq((44100, 1, 1), (48000, 2, 20), (32000, 2, 7))) {
      val b = MediaCodecs.encodeMp3(rate, ch, n)
      assert(b.length == n * MediaCodecs.mp3FrameLen(rate))
      assert(MediaCodecs.decodeMp3(b).contains((rate, ch, n)))
    }
    val good = MediaCodecs.encodeMp3(44100, 2, 3)
    // truncated mid-frame → reject; garbage between frames → reject
    assert(MediaCodecs.decodeMp3(good.dropRight(10)).isEmpty)
    assert(MediaCodecs.decodeMp3(good ++ "junk".getBytes).isEmpty)
    // "bad" (15) and free-format (0) bitrate indexes reject, not crash
    val badBr = good.clone(); badBr(2) = (15 << 4 | badBr(2) & 0xf).toByte
    assert(MediaCodecs.decodeMp3(badBr).isEmpty)
    val freeBr = good.clone(); freeBr(2) = (freeBr(2) & 0xf).toByte
    assert(MediaCodecs.decodeMp3(freeBr).isEmpty)
    // reserved sample-rate index rejects
    val badRate = good.clone(); badRate(2) = (badRate(2) | (3 << 2)).toByte
    assert(MediaCodecs.decodeMp3(badRate).isEmpty)
  }

  test("MP4 box walk: tkhd geometry via moov/trak, other boxes skipped") {
    for ((w, h) <- Seq((16, 16), (336, 255), (1920, 1080))) {
      val b = MediaCodecs.encodeMp4(w, h)
      assert(b.length == 124)
      assert(MediaCodecs.decodeMp4(b).contains((w, h)))
    }
    // an unknown top-level box before moov must be skipped
    val base = MediaCodecs.encodeMp4(99, 55)
    val free = Array(0, 0, 0, 12).map(_.toByte) ++
      "free".getBytes ++ new Array[Byte](4)
    val withFree = base.take(16) ++ free ++ base.drop(16)
    assert(MediaCodecs.decodeMp4(withFree).contains((99, 55)))
    // no ftyp lead-in → not an MP4
    assert(MediaCodecs.decodeMp4(base.drop(16)).isEmpty)
  }

  test("malformed payloads are rejected, dispatch falls back to stub") {
    assert(MediaCodecs.decodeBmp("not a bmp".getBytes).isEmpty)
    assert(MediaCodecs.decodeWav("RIFFxxxxJUNK".getBytes).isEmpty)
    assert(MediaCodecs.decodeWav(Array.emptyByteArray).isEmpty)
    // unknown bytes route to the deterministic stub — no pixel evidence
    val (w, h, f, cs, px) = Multimodal.decodeAny("image", "hello".getBytes)
    assert((w, h, f) == (6, 6, 1)) // fake formulas on n=5
    assert(cs == "hello".getBytes.map(_ & 0xff).sum % 997)
    assert(px.isEmpty)
  }

  test("decodeAny dispatches by magic and checksums real payloads") {
    // constant-fill payloads: decoded-content checksums are the closed
    // forms the SQL oracle recomputes (3·w·h·fill / dataBytes·fill)
    val bmp = MediaCodecs.encodeBmp(7, 5, fill = 40)
    assert(Multimodal.decodeAny("image", bmp) ==
      ((7, 5, 1, Multimodal.checksum(bmp), Some(3L * 7 * 5 * 40 % 997))))
    val wav = MediaCodecs.encodeWav(12000, 2, 99, fill = 17)
    assert(Multimodal.decodeAny("audio", wav) ==
      ((12000, 2, 99, Multimodal.checksum(wav),
        Some(99L * 2 * 2 * 17 % 997))))
  }

  test("ImageIO pixel decode: constant-fill BMP/PNG match closed form") {
    for ((w, h, fill) <- Seq((1, 1, 1), (16, 12, 200), (20, 10, 251))) {
      val closed = 3L * w * h * fill % 997
      assert(MediaCodecs.decodeImagePixels(MediaCodecs.encodeBmp(w, h, fill))
        .contains((w, h, closed)))
      assert(MediaCodecs.decodeImagePixels(MediaCodecs.encodePng(w, h, fill))
        .contains((w, h, closed)))
    }
    // zero fill decodes too (checksum 0) — the pixel read is real either way
    assert(MediaCodecs.decodeImagePixels(MediaCodecs.encodeBmp(4, 3))
      .contains((4, 3, 0L)))
  }

  test("ImageIO gradient round-trip: PNG lossless, GIF palette-exact") {
    // full-color gradient through the JDK PNG writer and back: lossless,
    // so the decoded raster reproduces the source checksum exactly
    val src = MediaCodecs.renderImage(23, 11, seed = 7)
    val png = MediaCodecs.encodeImageIO(src, "png")
    assert(MediaCodecs.decodePng(png).contains((23, 11))) // header walk too
    assert(MediaCodecs.decodeImagePixels(png)
      .contains((23, 11, MediaCodecs.pixelChecksum(src))))
    // a gradient that differs in one pixel must not collide
    val tweaked = MediaCodecs.renderImage(23, 11, seed = 7)
    tweaked.setRGB(22, 10, tweaked.getRGB(22, 10) ^ 1)
    assert(MediaCodecs.pixelChecksum(tweaked) !=
      MediaCodecs.pixelChecksum(src))
    // real LZW GIF of a single color: palette-lossless → closed form
    val gif = MediaCodecs.encodeGifReal(9, 6, fill = 77)
    assert(MediaCodecs.decodeGif(gif).contains((9, 6))) // header walk
    assert(MediaCodecs.decodeImagePixels(gif)
      .contains((9, 6, 3L * 9 * 6 * 77 % 997)))
  }

  test("pixel resize: identity is exact, constant fill keeps closed form") {
    // 1:1 "resize" of a gradient PNG copies the raster bit-exact
    val src = MediaCodecs.renderImage(23, 11, seed = 5)
    val png = MediaCodecs.encodeImageIO(src, "png")
    assert(MediaCodecs.resizeImagePixels(png, 23, 11)
      .contains(MediaCodecs.pixelChecksum(src)))
    // constant fill survives bilinear down-scaling: closed form on the
    // TARGET geometry, for RGB (BMP) and palette (real GIF) sources
    val bmp = MediaCodecs.encodeBmp(16, 12, fill = 93)
    assert(MediaCodecs.resizeImagePixels(bmp, 8, 6)
      .contains(3L * 8 * 6 * 93 % 997))
    val gif = MediaCodecs.encodeGifReal(9, 6, fill = 77)
    assert(MediaCodecs.resizeImagePixels(gif, 3, 2)
      .contains(3L * 3 * 2 * 77 % 997))
    // non-image bytes and degenerate targets refuse
    assert(MediaCodecs.resizeImagePixels("junk".getBytes, 4, 4).isEmpty)
    assert(MediaCodecs.resizeImagePixels(bmp, 0, 4).isEmpty)
    // fit-within geometry: never upscale, clamp to 1 px
    assert(graft.llm.Multimodal.fitWithin(4, 3, 8, 6) == (4, 3))
    assert(graft.llm.Multimodal.fitWithin(16, 1, 8, 6) == (8, 1))
    assert(graft.llm.Multimodal.fitWithin(16, 12, 8, 6) == (8, 6))
    assert(graft.llm.Multimodal.fitWithin(1, 12, 8, 6) == (1, 6))
    // extreme aspect ratio clamps to 1 px: 1×1000 into 8×6 floors the
    // scaled width to 0 without the clamp
    assert(graft.llm.Multimodal.fitWithin(1, 1000, 8, 6) == (1, 6))
  }

  test("resizePlan clamps extreme aspect ratios to 1 px like fitWithin") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val decoded = Seq(
      (1L, "image", 1, 480),    // height binds: out_w floors to 0 unclamped
      (2L, "image", 640, 2),    // width binds: out_h floors to 0 unclamped
      (3L, "image", 320, 240)   // ordinary downscale
    ).toDF("media_id", "media_type", "width", "height")
    val out = graft.llm.Multimodal.resizePlan(decoded, maxW = 224, maxH = 160)
      .orderBy(col("media_id"))
      .collect().map(r => (r.getInt(3), r.getInt(4)))
    assert(out.toSeq == Seq((1, 160), (224, 1), (213, 160)))
    // every output side is a valid raster dimension
    assert(out.forall { case (w, h) => w >= 1 && h >= 1 })
  }

  test("real JPEG: entropy-coded bytes decode; geometry fixture does not") {
    val jpg = MediaCodecs.encodeJpegReal(24, 16, seed = 3)
    // the hand-rolled SOF walk parses real-world JPEG bytes
    assert(MediaCodecs.decodeJpeg(jpg).contains((24, 16)))
    val decoded = MediaCodecs.decodeImagePixels(jpg)
    assert(decoded.exists { case (w, h, _) => w == 24 && h == 16 })
    // lossy but deterministic: same input → same bytes → same raster
    assert(MediaCodecs.decodeImagePixels(
      MediaCodecs.encodeJpegReal(24, 16, seed = 3)) == decoded)
    // the header-only geometry fixture has no scan data: pixel read
    // fails, header geometry stands, px_checksum stays empty
    val fixture = MediaCodecs.encodeJpeg(24, 16)
    assert(MediaCodecs.decodeImagePixels(fixture).isEmpty)
    assert(Multimodal.decodeAny("image", fixture) ==
      ((24, 16, 1, Multimodal.checksum(fixture), None)))
  }

  test("AIFF encode/decode round-trip incl. 80-bit extended rate") {
    for ((rate, ch, n) <- Seq((8000, 1, 1), (22050, 2, 255), (44100, 2, 4096),
        (48000, 1, 7), (96000, 2, 100))) {
      val b = MediaCodecs.encodeAiff(rate, ch, n)
      assert(MediaCodecs.decodeAiff(b).contains((rate, ch, n)),
        s"rate=$rate ch=$ch n=$n")
      assert(b.length == 54 + n * ch * 2)
      // WAV walker must not claim it and vice versa
      assert(MediaCodecs.decodeWav(b).isEmpty)
    }
    assert(MediaCodecs.decodeAiff("FORMxxxxJUNK".getBytes).isEmpty)
    // javax.sound reads AIFF PCM frames through the same sample path
    val filled = MediaCodecs.encodeAiff(8000, 1, 300, fill = 5)
    assert(MediaCodecs.decodeWavSamples(filled).contains(300L * 2 * 5 % 997))
    // dispatch: geometry + real sample checksum, no stub
    assert(Multimodal.decodeAny("audio", filled) ==
      ((8000, 1, 300, Multimodal.checksum(filled), Some(300L * 2 * 5 % 997))))
  }

  test("dHash: format-invariant, closed-form exact, planted edit near") {
    def decode(b: Array[Byte]) =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    // independent reimplementation of the signature from the affine
    // raster formula — the same closed form the DuckDB oracle replays
    def expected(seed: Int, perturbed: Boolean): Long = {
      def gray(sx: Int, sy: Int): Int = {
        val r0 = (sx * 7 + sy * 13 + seed) & 0xff
        val r = if (perturbed && sx == 4 && sy == 6) (r0 + 128) & 0xff else r0
        val g = (sx * 3 + sy * 5 + seed * 11) & 0xff
        val b = (sx * 17 + sy + seed * 29) & 0xff
        (r + g + b) / 3
      }
      var sig = 0L
      for (gy <- 0 until 8; gx <- 0 until 8)
        if (gray(2 * (gx + 1), 2 * gy) > gray(2 * gx, 2 * gy))
          sig |= 1L << (gy * 8 + gx)
      sig
    }
    var anyEdited = false
    for (seed <- 0 until 64) {
      val img = MediaCodecs.renderImage(18, 16, seed)
      val png = MediaCodecs.encodeImageIO(img, "png")
      val bmp = MediaCodecs.encodeImageIO(img, "bmp")
      val hPng = MediaCodecs.dhash64(decode(png))
      val hBmp = MediaCodecs.dhash64(decode(bmp))
      // lossless re-encode in another container: identical signature
      assert(hPng == hBmp, s"seed $seed: png/bmp dhash diverge")
      assert(hPng == expected(seed, perturbed = false),
        s"seed $seed: dhash != affine closed form")
      // planted one-pixel edit: the edited grid cell touches at most
      // the two adjacent-comparison bits (gx=1,gy=3) and (gx=2,gy=3)
      val ed = MediaCodecs.renderImage(18, 16, seed)
      val rgb = ed.getRGB(4, 6)
      val r = (((rgb >> 16) & 0xff) + 128) & 0xff
      ed.setRGB(4, 6, (r << 16) | (rgb & 0x00ffff))
      val hEd = MediaCodecs.dhash64(decode(MediaCodecs.encodeImageIO(ed, "png")))
      assert(hEd == expected(seed, perturbed = true))
      val dist = java.lang.Long.bitCount(hPng ^ hEd)
      assert(dist <= 2, s"seed $seed: edit moved $dist bits")
      if (dist > 0) anyEdited = true
    }
    // the perturbation is a real near-duplicate, not an exact one,
    // for at least some seeds
    assert(anyEdited)
  }

  test("aFP: WAV/AIFF-invariant, closed-form exact, planted edit near") {
    // independent reimplementation of the fingerprint from the sample
    // closed form — the same arithmetic the DuckDB oracle replays
    def sample(s: Int, i: Int, perturbed: Boolean): Int = {
      val base = (i * (s + 3) + (i % 17) * 41 + s * s) % 509 - 254
      if (perturbed && i == 100) base + 512 else base
    }
    def expected(s: Int, perturbed: Boolean): Long = {
      def e(f: Int): Long = (0 until 16).map { j =>
        val v = sample(s, f * 16 + j, perturbed).toLong; v * v
      }.sum
      var sig = 0L
      for (f <- 0 until 64) if (e(f + 1) > e(f)) sig |= 1L << f
      sig
    }
    var anyEdited = false
    for (s <- 0 until 48) {
      val clean = Array.tabulate(1040)(sample(s, _, perturbed = false))
      val wav = MediaCodecs.encodeWavPcm16(8000, clean)
      val aiff = MediaCodecs.encodeAiffPcm16(8000, clean)
      // both containers decode to the IDENTICAL PCM stream
      assert(MediaCodecs.decodePcm16(wav).map(_.toSeq)
        .contains(clean.toSeq), s"seed $s: wav pcm roundtrip")
      assert(MediaCodecs.decodePcm16(aiff).map(_.toSeq)
        .contains(clean.toSeq), s"seed $s: aiff pcm roundtrip")
      val hWav = MediaCodecs.decodePcm16(wav).flatMap(MediaCodecs.afp64).get
      val hAiff = MediaCodecs.decodePcm16(aiff).flatMap(MediaCodecs.afp64).get
      assert(hWav == hAiff, s"seed $s: wav/aiff afp diverge")
      assert(hWav == expected(s, perturbed = false),
        s"seed $s: afp != sample closed form")
      // one-sample edit (frame 6): touches at most bits 5 and 6
      val ed = Array.tabulate(1040)(sample(s, _, perturbed = true))
      val hEd = MediaCodecs.decodePcm16(
        MediaCodecs.encodeWavPcm16(8000, ed)).flatMap(MediaCodecs.afp64).get
      assert(hEd == expected(s, perturbed = true))
      val dist = java.lang.Long.bitCount(hWav ^ hEd)
      assert(dist <= 2, s"seed $s: edit moved $dist bits")
      if (dist > 0) anyEdited = true
    }
    assert(anyEdited)
    // too-short streams carry no fingerprint
    assert(MediaCodecs.afp64(Array.fill(64)(1)).isEmpty)
  }

  test("decodePcm16Fast is sample-identical to the javax.sound path") {
    // the lock-free hand parse must return byte-identical channel-0
    // samples on every payload shape the engine produces, plus the
    // conservative-fallback shapes (non-PCM, truncation, garbage)
    def samples(seed: Int, edit: Boolean): Array[Int] =
      Array.tabulate(1040) { i =>
        val base = (i * (seed + 3) + (i % 17) * 41 + seed * seed) % 509 - 254
        if (edit && i == 100) base + 512 else base
      }
    val payloads: Seq[Array[Byte]] =
      (for (s <- 0 until 8; e <- Seq(false, true)) yield Seq(
        MediaCodecs.encodeWavPcm16(8000, samples(s, e)),
        MediaCodecs.encodeAiffPcm16(8000, samples(s, e)))).flatten ++
      Seq(
        MediaCodecs.encodeWav(8000, 1, 300, fill = 5),   // constant fill
        MediaCodecs.encodeWav(44100, 2, 64, fill = -3),  // multi-channel
        MediaCodecs.encodeAiff(22050, 2, 64, fill = 7),  // BE multi-channel
        MediaCodecs.encodeWav(8000, 1, 0))               // zero frames
    for (p <- payloads) {
      val fast = MediaCodecs.decodePcm16Fast(p).map(_.toSeq)
      val jdk = MediaCodecs.decodePcm16Jdk(p).map(_.toSeq)
      assert(fast == jdk, s"fast/jdk divergence on ${p.length}-byte payload")
      assert(fast.nonEmpty)
    }
    // truncated data chunk: both clamp to the available frames
    val whole = MediaCodecs.encodeWavPcm16(8000, samples(3, false))
    val cut = whole.take(whole.length - 11)
    assert(MediaCodecs.decodePcm16Fast(cut).map(_.toSeq) ==
      MediaCodecs.decodePcm16Jdk(cut).map(_.toSeq))
    // garbage and non-PCM shapes return None from the fast path
    assert(MediaCodecs.decodePcm16Fast("RIFFxxxxJUNK".getBytes).isEmpty)
    assert(MediaCodecs.decodePcm16Fast(Array.emptyByteArray).isEmpty)
    assert(MediaCodecs.decodePcm16Fast(
      MediaCodecs.encodeMp3(44100, 2, 3)).isEmpty)
  }

  test("javax.sound WAV sample decode matches the data chunk bytes") {
    val wav = MediaCodecs.encodeWav(8000, 1, 300, fill = 5)
    assert(MediaCodecs.decodeWavSamples(wav).contains(300L * 2 * 5 % 997))
    assert(MediaCodecs.decodeWavSamples(MediaCodecs.encodeWav(8000, 2, 10))
      .contains(0L)) // zero samples read for real, checksum 0
    assert(MediaCodecs.decodeWavSamples("RIFFxxxxJUNK".getBytes).isEmpty)
    // MP3 frame sequences carry no JDK sample decoder: px stays empty
    val mp3 = MediaCodecs.encodeMp3(44100, 2, 3)
    assert(Multimodal.decodeAny("audio", mp3)._5.isEmpty)
  }
}
