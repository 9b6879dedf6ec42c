package graft.ml

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.Dataset

/** A media asset carrying REAL encoded bytes (PNG / BMP / WAV). */
final case class RealAsset(asset_id: Long, format: String, media: Array[Byte])

/** Result of a REAL decode: container metadata + exact integer features
  * computed from the decoded pixels/samples (integers → bit-exact across
  * JVMs and reproducible by the DuckDB oracle). */
final case class DecodedMedia(asset_id: Long, format: String, width: Int,
                              height: Int, sample_rate: Int, n_units: Long,
                              checksum: Long)

/** REAL media codecs on pure-JVM decoders — no native libraries:
  *
  *  - images: PNG and BMP via `javax.imageio.ImageIO` (both lossless RGB,
  *    so decoded pixels equal the generator's pixels exactly);
  *  - audio: WAV (RIFF container, 16-bit mono PCM) encoded and parsed by
  *    hand — header chunk walk + little-endian sample reads.
  *
  * This retires the round-3 "honest stub" boundary for the image and audio
  * modalities ([[Multimodal]] keeps the deterministic stub ONLY for video,
  * where no JDK decoder exists). The correctness contract is end-to-end:
  * the generator derives pixels/samples from closed-form integer formulas
  * of (asset_id, x, y, c) / (asset_id, i), encodes them through the REAL
  * codec, and the decoder must recover the exact metadata and pixel/sample
  * sums from the bytes alone — the DuckDB oracle (driver q45) recomputes
  * the same sums from the formulas in pure SQL, so a decoder that misparses
  * a header, drops a channel, or misreads sample endianness hash-mismatches.
  *
  * Scale shape: generation and decode are narrow `mapPartitions` maps (the
  * Arrow/Pandas-UDF batch boundary — per-partition init, rows streamed,
  * media bytes never shuffled); at 100 TB the media column is read only by
  * this stage and feature rows are ~10⁴× narrower than their inputs.
  */
object MediaCodec {

  // ---- deterministic generation formulas (shared with the SQL oracle;
  // all-integer so both sides are exact) ----

  /** Image dims: width 8-24, height 8-20 — small enough that encode cost is
    * codec work, not memory traffic. */
  def imgDims(id: Long): (Int, Int) =
    ((8 + id % 17).toInt, (8 + (id / 17) % 13).toInt)

  /** Channel value of pixel (x, y), c ∈ {0=r, 1=g, 2=b}. */
  def pixel(id: Long, x: Int, y: Int, c: Int): Int =
    ((id * 31 + x * 7 + y * 13 + c * 101) % 256).toInt

  /** (sampleRate, nSamples) for the WAV assets. */
  def wavParams(id: Long): (Int, Int) =
    ((8000 + (id % 4) * 4000).toInt, (200 + (id % 5) * 50).toInt)

  /** 16-bit PCM sample i ∈ [-2048, 2047]. */
  def wavSample(id: Long, i: Int): Short =
    ((id * 73 + i * 37) % 4096 - 2048).toShort

  /** Format by id: every third asset audio, images alternating PNG/BMP. */
  def formatOf(id: Long): String =
    if (id % 3 == 0) "wav" else if (id % 3 == 1) "png" else "bmp"

  // ---- encoders (generation side) ----

  /** Render the formula pixels and push them through the REAL ImageIO
    * encoder for `format` ("png" | "bmp"). */
  def encodeImage(id: Long, format: String): Array[Byte] = {
    val (w, h) = imgDims(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (pixel(id, x, y, 0) << 16) | (pixel(id, x, y, 1) << 8) | pixel(id, x, y, 2))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, bos), s"no ImageIO encoder for $format")
    bos.toByteArray
  }

  /** Standard 44-byte RIFF/WAVE header + 16-bit mono LE PCM data chunk. */
  def encodeWav(id: Long): Array[Byte] = {
    val (sr, n) = wavParams(id)
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sr)
      .putInt(sr * 2) // byte rate
      .putShort(2)    // block align
      .putShort(16)   // bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { bb.putShort(wavSample(id, i)); i += 1 }
    bb.array()
  }

  def encode(id: Long): Array[Byte] = formatOf(id) match {
    case "wav" => encodeWav(id)
    case f     => encodeImage(id, f)
  }

  /** Deterministic asset table with REAL encoded media bytes. */
  def generate(spark: org.apache.spark.sql.SparkSession, n: Long): Dataset[RealAsset] = {
    import spark.implicits._
    spark.range(n).mapPartitions { it =>
      ImageIO.setUseCache(false) // per-partition decoder/encoder init: no tmp-file cache
      it.map(id => RealAsset(id, formatOf(id), encode(id)))
    }
  }

  // ---- decoders (the REAL work: bytes in, metadata + features out) ----

  /** Container sniff by magic bytes. */
  def sniff(media: Array[Byte]): String =
    if (media.length >= 8 && (media(0) & 0xFF) == 0x89 && media(1) == 'P' &&
        media(2) == 'N' && media(3) == 'G') "png"
    else if (media.length >= 2 && media(0) == 'B' && media(1) == 'M') "bmp"
    else if (media.length >= 12 && media(0) == 'R' && media(1) == 'I' &&
        media(2) == 'F' && media(3) == 'F' && media(8) == 'W' &&
        media(9) == 'A' && media(10) == 'V' && media(11) == 'E') "wav"
    else if (media.length >= 6 && media(0) == 'G' && media(1) == 'I' &&
        media(2) == 'F' && media(3) == '8' &&
        (media(4) == '7' || media(4) == '9') && media(5) == 'a') "gif"
    else "unknown"

  /** Decode an image through ImageIO and sum decoded channel values —
    * checksum = Σ_{x,y} (r + g + b), exact integers. */
  private def decodeImage(id: Long, fmt: String, media: Array[Byte]): DecodedMedia = {
    val img = ImageIO.read(new ByteArrayInputStream(media))
    require(img != null, s"ImageIO failed to decode asset $id ($fmt, ${media.length} bytes)")
    val w = img.getWidth; val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        x += 1
      }
      y += 1
    }
    DecodedMedia(id, fmt, w, h, 0, w.toLong * h, sum)
  }

  /** Parse the RIFF chunk list (not fixed offsets: encoders may insert
    * LIST/fact chunks), read fmt then 16-bit LE PCM samples — checksum =
    * Σ samples, n_units = sample count across all channels. */
  private def decodeWav(id: Long, media: Array[Byte]): DecodedMedia = {
    val bb = java.nio.ByteBuffer.wrap(media).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(media.length >= 12, s"asset $id: truncated RIFF header")
    bb.position(12) // past RIFF<size>WAVE
    var sampleRate = 0; var bits = 0
    var sum = 0L; var nSamples = 0L
    while (bb.remaining() >= 8) {
      val tag = new String(Array(bb.get(), bb.get(), bb.get(), bb.get()), "US-ASCII")
      val len = bb.getInt()
      val next = bb.position() + len + (len & 1) // chunks are word-aligned
      tag match {
        case "fmt " =>
          val audioFormat = bb.getShort()
          require(audioFormat == 1, s"asset $id: non-PCM WAV (format $audioFormat)")
          bb.getShort() // channels (n_units counts samples across channels)
          sampleRate = bb.getInt()
          bb.getInt(); bb.getShort() // byte rate, block align
          bits = bb.getShort()
        case "data" =>
          require(bits == 16, s"asset $id: unsupported bit depth $bits (fmt chunk must precede data)")
          var off = 0
          while (off + 1 < len) { sum += bb.getShort(); nSamples += 1; off += 2 }
        case _ => // skip LIST/fact/etc
      }
      bb.position(math.min(next, bb.limit()))
    }
    DecodedMedia(id, "wav", 0, 0, sampleRate, nSamples, sum)
  }

  /** Decode any supported container (dispatch on sniffed magic, NOT on a
    * trusted format column — the bytes are the source of truth). */
  def decode(id: Long, media: Array[Byte]): DecodedMedia = sniff(media) match {
    case "wav"     => decodeWav(id, media)
    case f @ ("png" | "bmp") => decodeImage(id, f, media)
    case "gif"     => throw new IllegalArgumentException(
      s"asset $id is a multi-frame GIF video — use decodeVideo/explodeVideoFrames")
    case other     => throw new IllegalArgumentException(s"asset $id: unsupported container $other")
  }

  /** Decode a whole asset table — partition-batched like
    * [[Multimodal.extractFeatures]]: decoder configured once per partition,
    * rows streamed, media column read only here. */
  def decodeAll(assets: Dataset[RealAsset]): Dataset[DecodedMedia] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map(a => decode(a.asset_id, a.media))
    }
  }

  // -------------------------------------------------------- video (animated GIF)
  //
  // The VIDEO modality on a real pure-JVM container format: animated GIF —
  // ImageIO writes and reads multi-frame sequences natively. Frames are
  // INDEXED-palette (256 grayscale entries), so encoding is lossless and
  // the decoded per-frame pixel sums are exact integers the SQL oracle can
  // recompute from the generator formulas — same contract as the stills.
  // (Inter-frame-compressed codecs — H.264/VP9 — need native libraries this
  // container doesn't have; the GIF path is the honest JDK-native video.)

  /** Frame count 2-5, per-id frame dims 8-23 × 8-17. */
  def vidParams(id: Long): (Int, Int, Int) =
    ((2 + id % 4).toInt, (8 + (id * 3) % 16).toInt, (8 + (id * 5) % 10).toInt)

  /** Palette index of pixel (x, y) in frame f — grayscale value ∈ [0,255]. */
  def vidPixel(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 7 + f * 11 + x * 3 + y * 5) % 256).toInt

  private def grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** Render the formula frames and push them through the REAL ImageIO GIF
    * sequence writer (one multi-frame animated GIF per asset). */
  def encodeVideo(id: Long): Array[Byte] = {
    val (frames, w, h) = vidParams(id)
    val bos = new ByteArrayOutputStream()
    val out = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(out)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, vidPixel(id, f, x, y)); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); out.close() }
    bos.toByteArray
  }

  /** One decoded video frame: exact integer pixel sum over the frame. */
  final case class VideoFrame(asset_id: Long, frame: Int, width: Int,
                              height: Int, checksum: Long)

  /** REAL video decode from the bytes alone: open the GIF sequence reader,
    * count frames, sum each frame's decoded grayscale values (the palette
    * round-trips losslessly, so sums equal the generator formulas). */
  def decodeVideo(id: Long, media: Array[Byte]): Seq[VideoFrame] = {
    require(sniff(media) == "gif", s"asset $id: not a GIF container")
    val in = ImageIO.createImageInputStream(new ByteArrayInputStream(media))
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    try {
      reader.setInput(in, false)
      val n = reader.getNumImages(true)
      (0 until n).map { f =>
        val img = reader.read(f)
        val w = img.getWidth; val h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += img.getRGB(x, y) & 0xFF; x += 1 }
          y += 1
        }
        VideoFrame(id, f, w, h, sum)
      }
    } finally { reader.dispose(); in.close() }
  }

  /** Frame-explosion over a video table (one input row → one row per
    * decoded frame) — the mapInPandas-style shape, decoder per partition. */
  def explodeVideoFrames(videos: Dataset[RealAsset]): Dataset[VideoFrame] = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.flatMap(a => decodeVideo(a.asset_id, a.media))
    }
  }

  /** Deterministic animated-GIF video table. */
  def generateVideos(spark: org.apache.spark.sql.SparkSession, n: Long): Dataset[RealAsset] = {
    import spark.implicits._
    spark.range(n).mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map(id => RealAsset(id, "gif", encodeVideo(id)))
    }
  }
}
