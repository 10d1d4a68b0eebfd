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

  test("malformed payloads are rejected, dispatch falls back to stub") {
    assert(MediaCodecs.decodeBmp("not a bmp".getBytes).isEmpty)
    assert(MediaCodecs.decodeWav("RIFFxxxxJUNK".getBytes).isEmpty)
    assert(MediaCodecs.decodeWav(Array.emptyByteArray).isEmpty)
    // unknown bytes route to the deterministic stub
    val (w, h, f, cs) = Multimodal.decodeAny("image", "hello".getBytes)
    assert((w, h, f) == (6, 6, 1)) // fake formulas on n=5
    assert(cs == "hello".getBytes.map(_ & 0xff).sum % 997)
  }

  test("decodeAny dispatches by magic and checksums real payloads") {
    val bmp = MediaCodecs.encodeBmp(7, 5)
    assert(Multimodal.decodeAny("image", bmp) ==
      ((7, 5, 1, Multimodal.checksum(bmp))))
    val wav = MediaCodecs.encodeWav(12000, 2, 99)
    assert(Multimodal.decodeAny("audio", wav) ==
      ((12000, 2, 99, Multimodal.checksum(wav))))
  }
}
