package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** The REAL codecs must recover the generator formulas from the encoded
  * bytes alone — if a header parse, palette, channel order, or endianness
  * slips, these roundtrips (and the driver's q45/q50 SQL oracles) fail. */
class MediaCodecSpec extends AnyFunSuite {

  test("PNG and BMP roundtrip exact pixel sums and dims") {
    for (id <- Seq(1L, 2L, 47L, 100L, 299L)) {
      val fmt = MediaCodec.formatOf(id)
      if (fmt != "wav") {
        val (w, h) = MediaCodec.imgDims(id)
        val want = (for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
          yield MediaCodec.pixel(id, x, y, c).toLong).sum
        val d = MediaCodec.decode(id, MediaCodec.encodeImage(id, fmt))
        assert((d.width, d.height, d.n_units, d.checksum) == (w, h, w.toLong * h, want), s"id=$id $fmt")
      }
    }
  }

  test("WAV roundtrips exact sample sums through the RIFF chunk walk") {
    for (id <- Seq(0L, 3L, 48L, 297L)) {
      val (sr, n) = MediaCodec.wavParams(id)
      val want = (0 until n).map(i => MediaCodec.wavSample(id, i).toLong).sum
      val d = MediaCodec.decode(id, MediaCodec.encodeWav(id))
      assert((d.sample_rate, d.n_units, d.checksum) == (sr, n.toLong, want), s"id=$id")
    }
  }

  test("animated-GIF video roundtrips frame count, dims, and per-frame sums") {
    for (id <- Seq(0L, 1L, 5L, 42L, 119L)) {
      val (frames, w, h) = MediaCodec.vidParams(id)
      val decoded = MediaCodec.decodeVideo(id, MediaCodec.encodeVideo(id))
      assert(decoded.length == frames, s"id=$id frame count")
      for (f <- 0 until frames) {
        val want = (for (y <- 0 until h; x <- 0 until w)
          yield MediaCodec.vidPixel(id, f, x, y).toLong).sum
        val vf = decoded(f)
        assert((vf.frame, vf.width, vf.height, vf.checksum) == (f, w, h, want), s"id=$id f=$f")
      }
    }
  }

  test("decode dispatches on sniffed magic, not a trusted label") {
    assert(MediaCodec.sniff(MediaCodec.encodeImage(1L, "png")) == "png")
    assert(MediaCodec.sniff(MediaCodec.encodeImage(2L, "bmp")) == "bmp")
    assert(MediaCodec.sniff(MediaCodec.encodeWav(0L)) == "wav")
    assert(MediaCodec.sniff(MediaCodec.encodeVideo(3L)) == "gif")
    assert(MediaCodec.sniff(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)) == "unknown")
    intercept[IllegalArgumentException](MediaCodec.decode(9L, MediaCodec.encodeVideo(9L)))
    intercept[IllegalArgumentException](MediaCodec.decode(9L, Array[Byte](0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)))
  }
}
