package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * Decode happens at two depths, both REAL:
  *  - header walk ([[MediaCodecs]] byte-level parsers, dispatched by
  *    magic number): geometry/rate/frame-count for BMP, PNG, JPEG, GIF,
  *    WAV, AIFF, MP3, MP4 — the cheap metadata probe;
  *  - content decode (JDK standard library, zero new deps):
  *    `javax.imageio` reads the actual pixel raster for
  *    BMP/PNG/GIF/JPEG and `javax.sound.sampled` the actual PCM frames
  *    for WAV/AIFF, producing `px_checksum` over decoded CONTENT.
  * Payloads no parser recognizes fall back to [[FakeDecoder.decode]],
  * a deterministic stub that is the clearly-marked seam where a
  * JNI/ONNX codec would plug in; the only in-format capability still
  * stubbed is MP3/MP4 *sample/frame payload* decode (needs codec
  * libraries outside the JDK — px_checksum stays null there).
  * Everything around the decode — the schema, the binary column, the
  * batched `mapPartitions` shape, the partitioning — is real in all
  * paths.
  *
  * Scale notes: decode is a per-row map over partition iterators (no
  * shuffle, no driver data). Batch shape mirrors Arrow-batch processing:
  * rows are processed in groups of [[BatchSize]] so a vectorized decoder
  * amortizes per-batch setup, exactly like `mapInPandas` batches do.
  */
object Multimodal {

  val BatchSize = 256

  /** Typed metadata carried beside the opaque payload. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType), // image | audio | video
    StructField("payload", BinaryType),
    StructField("n_bytes", LongType)))

  /** Decoded-feature schema. `checksum` is over raw payload BYTES (all
    * paths); `px_checksum` is over decoded pixel/sample CONTENT — null
    * when only header metadata is available (geometry-only fixtures,
    * MP3/MP4 payloads, unrecognized bytes). */
  val DecodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("checksum", LongType),
    StructField("px_checksum", LongType)))

  /** Build a media table from the documents table: the text bytes stand in
    * for an image/audio payload (deterministic; media_type cycles by id).
    * In production this column comes from the lakehouse as real bytes. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("media_type"),
      col("text").cast(BinaryType).as("payload"),
      length(col("text")).cast(LongType).as("n_bytes"))

  /** Synthetic REAL media from the documents table: image rows carry an
    * actual BMP, PNG, JPEG, or GIF, audio rows an actual WAV or MP3
    * frame sequence, video rows an MP4 box tree (MediaCodecs
    * encode/parse), with geometry derived from the id (so a correctness
    * oracle can recompute the decoded features without parsing bytes);
    * every 8th row keeps text bytes (the documented stub path). Payload
    * construction is a partition-local typed map — the same shape a
    * lakehouse ingest job would use. */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        // constant non-zero pixel/sample fill (id-derived) keeps the
        // decoded-content checksum in SQL-closed form: 3·w·h·fill for
        // images, dataBytes·fill for PCM, both mod 997
        val fill = (id % 251).toInt + 1
        val payload = (id % 8) match {
          case 0 => MediaCodecs.encodeBmp(
            (id % 16).toInt + 1, (id % 12).toInt + 1, fill)
          case 1 => MediaCodecs.encodeWav(
            8000 + (id % 8).toInt * 1000, (id % 2).toInt + 1,
            (id % 256).toInt + 1, fill)
          case 2 => MediaCodecs.encodePng(
            (id % 20).toInt + 1, (id % 10).toInt + 1, fill)
          case 3 => MediaCodecs.encodeJpeg(
            (id % 30).toInt + 1, (id % 14).toInt + 1)
          case 4 => MediaCodecs.encodeGif(
            (id % 25).toInt + 1, (id % 15).toInt + 1)
          case 5 => MediaCodecs.encodeMp3(
            Seq(44100, 48000, 32000)((id % 3).toInt),
            (id % 2).toInt + 1, (id % 20).toInt + 1)
          case 6 => MediaCodecs.encodeMp4(
            (id % 320).toInt + 16, (id % 240).toInt + 16)
          case _ => text.getBytes("UTF-8") // the documented stub path
        }
        val mt = (id % 8) match {
          case 0 | 2 | 3 | 4 => "image"
          case 1 | 5 => "audio"
          case _ => "video"
        }
        MediaRow(id, mt, payload, payload.length.toLong)
      })
      .toDF()
  }

  /** Synthetic media where every payload's CONTENT is fully decodable
    * with the JDK alone: constant-fill BMP / PNG / PCM WAV
    * (hand-rolled encoders) and a real LZW-compressed GIF written by
    * ImageIO — all four chosen so the decoded pixel/sample checksum has
    * a closed form (3·w·h·fill or dataBytes·fill, mod 997) an
    * arithmetic SQL oracle recomputes without parsing a byte. The
    * lossy/ImageIO-encoded cases (JPEG entropy data, variable GIF
    * sizes) are pinned by CodecSpec instead, where exact byte-size
    * oracles don't apply. */
  def syntheticPixelMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val fill = (id % 251).toInt + 1
        val w = (id % 16).toInt + 1
        val h = (id % 12).toInt + 1
        val payload = (id % 4) match {
          case 0 => MediaCodecs.encodeBmp(w, h, fill)
          case 1 => MediaCodecs.encodePng(w, h, fill)
          case 2 => MediaCodecs.encodeGifReal(w, h, fill)
          case _ => MediaCodecs.encodeWav(8000 + (id % 8).toInt * 1000,
            (id % 2).toInt + 1, (id % 256).toInt + 1, fill)
        }
        val mt = if (id % 4 == 3) "audio" else "image"
        MediaRow(id, mt, payload, payload.length.toLong)
      })
      .toDF()
  }

  /** STUB decoder — deterministic fake in place of a real codec, used
    * only for payloads no real parser here understands (see
    * [[decodeAny]]). PERMANENT CONTRACT (SURVEY §8.13, r9): header
    * walks are real for all 8 containers and content decode is real
    * for BMP/PNG/GIF/JPEG pixels and WAV/AIFF PCM; MP3/MP4 PAYLOAD
    * decode is out of scope by design (no JDK codec; a compressed-AV
    * codec is a library, not an analytics operator) — a production
    * deployment plugs a JNI/FFI codec into the same batched
    * mapPartitions loop here without touching any plan shape. */
  object FakeDecoder {
    def decode(mediaType: String, payload: Array[Byte])
        : (Int, Int, Int, Long) = {
      val n = payload.length
      // ??? real codec goes here; deterministic fake below
      val width = (n % 640) + 1
      val height = (n % 480) + 1
      val frames = mediaType match {
        case "video" => (n % 24) + 1
        case "audio" => (n % 16000) + 1 // "samples"
        case _ => 1
      }
      (width, height, frames, checksum(payload))
    }
  }

  /** Payload checksum (all decode paths): byte sum mod 997. */
  def checksum(payload: Array[Byte]): Long = {
    var cs = 0L
    var i = 0
    while (i < payload.length) { cs = (cs + (payload(i) & 0xff)) % 997; i += 1 }
    cs
  }

  /** Decode dispatch: real parse for recognized magics (BMP, PNG, JPEG,
    * GIF, MP4 geometry; WAV and MP3 audio), stub otherwise. Feature
    * mapping — image/video geometry: (width, height, 1 frame); audio:
    * (sample_rate, channels, n_samples|n_frames) in the (width, height,
    * n_frames) slots. The 5th element is the decoded-CONTENT checksum:
    * real pixel raster via `javax.imageio` for image formats, real PCM
    * frames via `javax.sound.sampled` for WAV; None when only header
    * metadata exists (geometry-only fixtures, MP3/MP4 payloads, stub
    * path). The ImageIO/audio attempt is gated on a matching magic so
    * arbitrary bytes never pay a reader probe. */
  def decodeAny(mediaType: String, payload: Array[Byte])
      : (Int, Int, Int, Long, Option[Long]) =
    MediaCodecs.decodeBmp(payload)
      .orElse(MediaCodecs.decodePng(payload))
      .orElse(MediaCodecs.decodeJpeg(payload))
      .orElse(MediaCodecs.decodeGif(payload)) match {
      case Some((w, h)) =>
        (w, h, 1, checksum(payload),
          MediaCodecs.decodeImagePixels(payload).map(_._3))
      case None => MediaCodecs.decodeMp4(payload) match {
        case Some((w, h)) => (w, h, 1, checksum(payload), None)
        case None => MediaCodecs.decodeWav(payload)
          .orElse(MediaCodecs.decodeAiff(payload)) match {
          case Some((rate, ch, n)) =>
            // javax.sound reads the PCM frames of BOTH containers
            (rate, ch, n, checksum(payload),
              MediaCodecs.decodeWavSamples(payload))
          case None => MediaCodecs.decodeMp3(payload) match {
            case Some((rate, ch, frames)) =>
              (rate, ch, frames, checksum(payload), None)
            case None =>
              val (w, h, f, cs) = FakeDecoder.decode(mediaType, payload)
              (w, h, f, cs, None)
          }
        }
      }
    }

  /** Encoder-side row types for the typed mapPartitions (kept static so
    * the case-class Encoders resolve). */
  final case class MediaRow(media_id: Long, media_type: String,
                            payload: Array[Byte], n_bytes: Long)
  final case class DecodedRow(media_id: Long, media_type: String,
                              n_bytes: Long, width: Int, height: Int,
                              n_frames: Int, checksum: Long,
                              px_checksum: Option[Long])

  /** Decode/feature-extract over partition-local batches. The iterator is
    * grouped into [[BatchSize]] chunks so a vectorized decoder can process
    * a batch at a time (the Scala analogue of a `mapInPandas` batch).
    *
    * Typed `Dataset.mapPartitions` with case-class Encoders — rows stay
    * in Tungsten binary form and the operator composes inside the plan
    * (the former `.rdd.mapPartitions` detour dropped codegen and AQE
    * statistics for everything downstream). */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media_type", "payload", "n_bytes")
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          // per-batch decoder setup would happen here (model load, codec init)
          batch.iterator.map { m =>
            val (w, h, f, cs, px) = decodeAny(m.media_type, m.payload)
            DecodedRow(m.media_id, m.media_type, m.n_bytes, w, h, f, cs, px)
          }
        }
      }
      .toDF()
  }

  /** Frame-sampling shape for video: emit every `stride`-th frame index as
    * its own row (explode — the downstream per-frame pipeline is then
    * plain relational). */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded.filter(col("media_type") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1,
          lit(stride))).as("frame_idx"))

  final case class ResizedPixelsRow(media_id: Long, width: Int,
                                    height: Int, out_w: Int, out_h: Int,
                                    px_checksum: Option[Long])

  /** REAL pixel resize: the [[resizePlan]] fit-within-box geometry
    * EXECUTED on actual rasters (ImageIO decode → bilinear Graphics2D
    * resample → checksum of the resized pixels —
    * [[MediaCodecs.resizeImagePixels]]). Same typed-mapPartitions batch
    * shape as [[decodeFeatures]]; image rows only (the decode gate is a
    * real magic parse, so arbitrary bytes never pay an ImageIO probe).
    * Degenerate aspect ratios clamp the short side to 1 pixel. */
  def resizePixels(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media_type", "payload", "n_bytes")
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { m =>
            MediaCodecs.decodeBmp(m.payload)
              .orElse(MediaCodecs.decodePng(m.payload))
              .orElse(MediaCodecs.decodeJpeg(m.payload))
              .orElse(MediaCodecs.decodeGif(m.payload))
              .map { case (w, h) =>
                val (ow, oh) = fitWithin(w, h, maxW, maxH)
                ResizedPixelsRow(m.media_id, w, h, ow, oh,
                  MediaCodecs.resizeImagePixels(m.payload, ow, oh))
              }
          }
        }
      }
      .toDF()
  }

  /** The [[resizePlan]] integer geometry as a plain function (shared by
    * [[resizePixels]]): fit within (maxW, maxH), preserve aspect, never
    * upscale, clamp to ≥1 px. */
  private[graft] def fitWithin(w: Int, h: Int, maxW: Int,
                             maxH: Int): (Int, Int) =
    if (w <= maxW && h <= maxH) (w, h)
    else if (w.toLong * maxH >= h.toLong * maxW)
      (maxW, math.max(1L, h.toLong * maxW / w).toInt)
    else (math.max(1L, w.toLong * maxH / h).toInt, maxH)

  /** Resize plan for image media: fit-within-box scaling that preserves
    * aspect ratio (integer arithmetic, floor, min scale). The actual
    * pixel resample belongs to the stubbed codec; the SHAPE — per-row
    * map computing target geometry the codec executes — is the real
    * pipeline step, and the geometry itself is engine-portable and
    * oracle-checked. Never upscales (scale capped at 1:1). */
  def resizePlan(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("width").cast(LongType)
    val h = col("height").cast(LongType)
    // exact rational arithmetic, floor division (both engines agree on
    // integer // for non-negatives). Width "binds" when w/maxW >= h/maxH
    // ⇔ w·maxH >= h·maxW.
    val fits = w <= maxW && h <= maxH
    val widthBinds = w * maxH >= h * maxW
    // clamp the scaled side to >= 1 px (extreme aspect ratios floor to
    // 0 otherwise) — the same clamp fitWithin/resizePixels execute, so
    // the plan form and the pixel form stay one geometry
    val outW = when(fits, w)
      .otherwise(when(widthBinds, lit(maxW.toLong))
        .otherwise(greatest(w * maxH / h, lit(1L))))
    val outH = when(fits, h)
      .otherwise(when(widthBinds, greatest(h * maxW / w, lit(1L)))
        .otherwise(lit(maxH.toLong)))
    decoded.filter(col("media_type") === "image")
      .select(col("media_id"), col("width"), col("height"),
        outW.cast(IntegerType).as("out_w"),
        outH.cast(IntegerType).as("out_h"))
  }

  // ---- perceptual image dedup (dHash + banded hamming join) ----

  /** Synthetic images with CONTENT, for the perceptual-dedup path: the
    * deterministic affine raster [[MediaCodecs.renderImage]] at a fixed
    * 18×16 geometry, seeded by `doc_id % 64` — ids sharing a seed carry
    * visually identical content, so the corpus is full of planted
    * duplicate cliques. Two twists make the near-dup classes real:
    *
    *  - FORMAT re-encode: the container alternates PNG / BMP per 64-id
    *    generation (`(id / 64) % 2`, both via ImageIO, both lossless),
    *    so copies of the same seed appear in BOTH containers —
    *    duplicate detection must work across formats, which byte-level
    *    hashing cannot do.
    *  - SMALL EDIT: every 5th id flips the red channel's high bit at
    *    pixel (4,6) — exactly one dHash grid sample — so the edited
    *    copy lands 0–2 hamming bits from its clean twin: a genuine
    *    near-duplicate, not an exact one.
    *
    * Because the raster is an integer affine function of (x, y, seed)
    * and both containers round-trip losslessly, the decoded pixels —
    * and therefore the dHash bits — have a closed form an SQL oracle
    * replays without touching a byte. */
  def syntheticContentImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val img = MediaCodecs.renderImage(18, 16, (id % 64).toInt)
        if (id % 5 == 0) {
          val rgb = img.getRGB(4, 6)
          val r = (((rgb >> 16) & 0xff) + 128) & 0xff
          img.setRGB(4, 6, (r << 16) | (rgb & 0x00ffff))
        }
        val payload = MediaCodecs.encodeImageIO(
          img, if ((id / 64) % 2 == 0) "png" else "bmp")
        MediaRow(id, "image", payload, payload.length.toLong)
      })
      .toDF()
  }

  final case class DHashRow(media_id: Long, dhash: Long)

  /** Per-image 64-bit dHash signatures: real ImageIO decode (gated on
    * an image magic like [[decodeAny]]) → [[MediaCodecs.dhash64]] over
    * the actual raster. Map-only typed mapPartitions — linear in corpus
    * bytes, no shuffle; rows whose payload no reader accepts are
    * dropped (no signature, no dedup evidence). */
  def dhashSignatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media_type", "payload", "n_bytes")
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { m =>
            val isImage = MediaCodecs.decodeBmp(m.payload)
              .orElse(MediaCodecs.decodePng(m.payload))
              .orElse(MediaCodecs.decodeJpeg(m.payload))
              .orElse(MediaCodecs.decodeGif(m.payload)).isDefined
            if (!isImage) None
            else {
              val img = MediaCodecs.readImage(m.payload)
              if (img == null) None
              else Some(DHashRow(m.media_id, MediaCodecs.dhash64(img)))
            }
          }
        }
      }
      .toDF()
  }

  /** Perceptual near-duplicate image pairs: dHash signatures → banded
    * hamming self-join in DISTINCT-SIGNATURE space → re-expand to
    * media-id pairs — the [[Dedup.simhashPairs]] machinery verbatim,
    * with the 64-bit signature split into 4×16-bit bands (pigeonhole
    * completeness for maxHamming < 4). Output (id_a, id_b, dist),
    * id_a < id_b.
    *
    * At 100 TB this is the scale shape: signature extraction is
    * map-only over image bytes, the quadratic step runs over distinct
    * signatures (re-encoded duplicate floods collapse to one node), and
    * the only corpus-sized exchange is the band-key equi-join. Like the
    * text pair lists, the PAIR output is quadratic per duplicate clique
    * by definition — a production pass should feed these edges to the
    * cluster collapse (keep/drop per image) rather than materialize
    * pairs. */
  def imageDedupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4,
      s"4×16-bit banded search complete only for maxHamming < 4")
    val sig = dhashSignatures(media)
      .select(col("media_id").as("doc"), col("dhash").as("simhash"))
      .localCheckpoint()
    Dedup.expandSigPairs(sig,
      Dedup.simhashSigPairs(sig, maxHamming, bandBits = 16, nBands = 4))
  }

  /** The dHash of one payload: real ImageIO decode gated on an image
    * magic, None for payloads no reader accepts. */
  private def dhashOf(payload: Array[Byte]): Option[Long] = {
    val isImage = MediaCodecs.decodeBmp(payload)
      .orElse(MediaCodecs.decodePng(payload))
      .orElse(MediaCodecs.decodeJpeg(payload))
      .orElse(MediaCodecs.decodeGif(payload)).isDefined
    if (!isImage) None
    else {
      val img = MediaCodecs.readImage(payload)
      if (img == null) None else Some(MediaCodecs.dhash64(img))
    }
  }

  /** Append a nullable signature column computed per-row from the
    * binary `payload` column, keeping EVERY caller column (a streaming
    * caller's event-time column must survive for downstream
    * watermarking — the novelty streams depend on this). Row-encoded
    * mapPartitions over the caller's own schema — map-only, identical
    * on batch and streaming frames. */
  private def withSignature(media: DataFrame, outCol: String)
                           (sigOf: Array[Byte] => Option[Long]): DataFrame = {
    require(!media.columns.exists(_.equalsIgnoreCase(outCol)),
      s"$outCol already exists on the input frame")
    val pIdx = media.schema.fieldIndex("payload")
    val outSchema = media.schema.add(outCol, LongType, nullable = true)
    media.mapPartitions { it =>
      it.map { r =>
        val sig: Any = sigOf(r.getAs[Array[Byte]](pIdx)).orNull
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ sig)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Append a nullable `dhash` column to a media frame (ALL original
    * columns kept — an extra event-time or metadata column survives):
    * real ImageIO decode gated on an image magic, null for payloads no
    * reader accepts. Map-only — works identically on batch and
    * STREAMING frames (no shuffle, no state), which is what
    * [[graft.streaming.Events.imageNoveltyStream]] builds on. */
  def withDhash(media: DataFrame): DataFrame =
    withSignature(media, "dhash")(dhashOf)

  /** Band-bucketed lookup index over a (model-sized) signature set, for
    * serving-time near-duplicate checks without a join: key =
    * band·2¹⁶ + 16-bit band value, value = the signatures carrying it.
    * By pigeonhole any signature within hamming < 4 of an indexed one
    * shares at least one of the 4 bands, so a per-row lookup of the 4
    * band keys followed by an exact popcount verify is COMPLETE for
    * maxHamming ≤ 3 — O(1)-ish per row against a broadcast/plan-literal
    * map, the same serving shape as the DSIR model and the classifier
    * weight table. */
  def dhashBandIndex(sigs: Seq[Long]): Map[Long, Seq[Long]] =
    sigs.distinct
      .flatMap(s => (0 until 4).map(b =>
        (b.toLong << 16 | ((s >>> (b * 16)) & 0xffffL), s)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }

  /** [[dhashBandIndex]]'s DISTRIBUTED twin: the band-exploded form of a
    * 64-bit signature index as a DataFrame — each distinct signature
    * becomes 4 `(band_key, sig)` rows, band_key = band << 16 | the
    * band's 16 bits (geometry-generic over any 64-bit signature: dHash,
    * aFP, SimHash64). This is the shape a corpus-scale index lives in —
    * a table, probed by equi-join on `band_key`
    * ([[graft.streaming.Events.imageNoveltyJoin]]) — where the
    * plan-literal map form is bounded to model-sized indexes. NULL and
    * duplicate signatures collapse away (duplicates cannot change a
    * near-duplicate decision). */
  def bandIndexRows(index: DataFrame, sigCol: String): DataFrame = {
    val sig = col(sigCol).cast(LongType)
    index.select(sig.as("sig")).filter(col("sig").isNotNull).distinct()
      .select(col("sig"), explode(array((0 until 4).map { b =>
        lit(b.toLong << 16) +
          shiftright(col("sig"), b * 16).bitwiseAND(lit(0xffffL))
      }: _*)).as("band_key"))
      .select(col("band_key"), col("sig"))
  }

  // ---- perceptual AUDIO dedup (the image stack on the time axis) -----

  /** Synthetic content-bearing AUDIO corpus over `documents`: mono
    * 16-bit PCM of 1040 samples (65 aFP frames × 16), seeded by
    * `doc_id % 48` — ids sharing a seed carry identical sample content,
    * planted duplicate cliques like [[syntheticContentImages]]. Same two
    * twists: the CONTAINER alternates WAV / AIFF per 48-id generation
    * (identical PCM, little- vs big-endian bytes — byte hashing cannot
    * match them); every 5th id shifts ONE sample (+512 at i=100, frame
    * 6), landing the edited copy ≤ 2 hamming bits from its clean twin.
    * Sample i of seed s is the integer closed form
    * `((i·(s+3) + (i%17)·41 + s²) mod 509) − 254`, so frame energies —
    * and the aFP bits — are SQL-replayable without touching a byte. */
  def syntheticContentAudio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val s = (id % 48).toInt
        val samples = Array.tabulate(1040) { i =>
          val base = (i * (s + 3) + (i % 17) * 41 + s * s) % 509 - 254
          if (id % 5 == 0 && i == 100) base + 512 else base
        }
        val payload =
          if ((id / 48) % 2 == 0) MediaCodecs.encodeWavPcm16(8000, samples)
          else MediaCodecs.encodeAiffPcm16(8000, samples)
        MediaRow(id, "audio", payload, payload.length.toLong)
      })
      .toDF()
  }

  final case class AfpRow(media_id: Long, afp: Long)

  /** Per-audio 64-bit fingerprints: real javax.sound PCM decode (gated
    * on a RIFF/FORM magic like [[dhashSignatures]]' image gate) →
    * [[MediaCodecs.afp64]] over the actual samples. Map-only — linear
    * in corpus bytes, no shuffle; undecodable or too-short payloads are
    * dropped (no signature, no dedup evidence). */
  def audioFingerprints(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media_type", "payload", "n_bytes")
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { m =>
            val isAudio = MediaCodecs.decodeWav(m.payload)
              .orElse(MediaCodecs.decodeAiff(m.payload)).isDefined
            if (!isAudio) None
            else MediaCodecs.decodePcm16(m.payload)
              .flatMap(MediaCodecs.afp64)
              .map(AfpRow(m.media_id, _))
          }
        }
      }
      .toDF()
  }

  /** Perceptual near-duplicate AUDIO pairs: aFP fingerprints → banded
    * hamming self-join in DISTINCT-SIGNATURE space → re-expand to media
    * ids — [[imageDedupPairs]]' machinery verbatim (4×16-bit bands,
    * pigeonhole-complete for maxHamming < 4). Output (id_a, id_b,
    * dist), id_a < id_b. Same 100 TB shape as the image form:
    * extraction map-only, quadratic step over distinct signatures,
    * band-key equi-join the only corpus-sized exchange. */
  def audioDedupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4,
      s"4×16-bit banded search complete only for maxHamming < 4")
    val sig = audioFingerprints(media)
      .select(col("media_id").as("doc"), col("afp").as("simhash"))
      .localCheckpoint()
    Dedup.expandSigPairs(sig,
      Dedup.simhashSigPairs(sig, maxHamming, bandBits = 16, nBands = 4))
  }

  /** The aFP of one payload: real javax.sound PCM decode gated on a
    * RIFF/FORM magic, None for payloads no decoder accepts. */
  private def afpOf(payload: Array[Byte]): Option[Long] = {
    val isAudio = MediaCodecs.decodeWav(payload)
      .orElse(MediaCodecs.decodeAiff(payload)).isDefined
    if (!isAudio) None
    else MediaCodecs.decodePcm16(payload).flatMap(MediaCodecs.afp64)
  }

  /** Append a nullable `afp` column to a media frame (ALL original
    * columns kept — see [[withDhash]]) — its audio twin: real
    * javax.sound PCM decode gated on a RIFF/FORM magic, null for
    * payloads no decoder accepts. Map-only — identical on batch and
    * STREAMING frames, which is what
    * [[graft.streaming.Events.audioNoveltyStream]] builds on. */
  def withAfp(media: DataFrame): DataFrame =
    withSignature(media, "afp")(afpOf)

  /** Perceptual audio dedup CLUSTERS — the per-clip keep/drop decision,
    * [[imageDedupClusters]]' machinery over aFP fingerprints: connected
    * components of the banded hamming graph in distinct-signature
    * space, rep = MIN media id, keep iff rep. Clips no decoder accepts
    * stay singleton clusters. */
  def audioDedupClusters(media: DataFrame, maxHamming: Int = 3,
                         maxIter: Int = 20,
                         driverEdgeLimit: Long = 1000000L): DataFrame = {
    require(maxHamming < 4,
      s"4×16-bit banded search complete only for maxHamming < 4")
    val sig = audioFingerprints(media)
      .select(col("media_id").as("doc"), col("afp").as("sfp"))
      .localCheckpoint()
    val edges = Dedup.simhashSigPairs(
        sig.select(col("doc"), col("sfp").as("simhash")),
        maxHamming, bandBits = 16, nBands = 4)
      .select(col("sa").as("id_a"), col("sb").as("id_b"))
      .localCheckpoint()
    Dedup.inheritSigComponents(
      media.select(col("media_id").as("doc")).distinct(),
      sig, edges, maxIter, driverEdgeLimit)
  }

  /** Perceptual image dedup CLUSTERS — the per-image keep/drop decision
    * a 100 TB media pass actually wants (the pair list is quadratic per
    * duplicate clique; this is linear per image): connected components
    * over the banded dHash signature graph, each image inheriting its
    * signature's component, rep = MIN media id. Output (doc, rep, keep)
    * like [[Dedup.simhashClusters]], whose signature-space machinery
    * this reuses end to end (distinct-signature nodes — a re-encoded
    * duplicate flood is ONE node regardless of multiplicity; images no
    * reader decodes stay singleton clusters). */
  def imageDedupClusters(media: DataFrame, maxHamming: Int = 3,
                         maxIter: Int = 20,
                         driverEdgeLimit: Long = 1000000L): DataFrame = {
    require(maxHamming < 4,
      s"4×16-bit banded search complete only for maxHamming < 4")
    val sig = dhashSignatures(media)
      .select(col("media_id").as("doc"), col("dhash").as("sfp"))
      .localCheckpoint()
    val edges = Dedup.simhashSigPairs(
        sig.select(col("doc"), col("sfp").as("simhash")),
        maxHamming, bandBits = 16, nBands = 4)
      .select(col("sa").as("id_a"), col("sb").as("id_b"))
      .localCheckpoint()
    Dedup.inheritSigComponents(
      media.select(col("media_id").as("doc")).distinct(),
      sig, edges, maxIter, driverEdgeLimit)
  }
}
