package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Bmp, MediaMeta, MediaRecord}

/** r12 directive 5: the WAV kernel pattern promoted to an image format.
  * A dependency-free 24bpp BMP parse (header walk, bottom-up rows,
  * 4-byte row padding, negative-height top-down variant) feeds the
  * pHash path over REAL decoded pixels — fixtures are generated
  * in-test, exactly as WavVadSpec did for audio. */
class BmpDecodeSpec extends SparkSuite {

  private def gray(w: Int, h: Int)(f: Int => Int): Array[Int] =
    Array.tabulate(w * h)(k => f(k) & 0xff)

  test("encode -> parse roundtrip recovers width, height and every pixel") {
    val px = gray(16, 16)(k => (k * 37 + 11) % 256)
    val img = Bmp.parse(Bmp.encodeGray(16, 16, px))
    assert(img.width == 16 && img.height == 16)
    assert(img.luma.toSeq == px.toSeq)
  }

  test("row padding: widths not divisible by 4 roundtrip exactly") {
    for (w <- Seq(1, 2, 3, 5, 7); h <- Seq(1, 3, 4)) {
      val px = gray(w, h)(k => (k * 13 + w * 7 + h) % 256)
      val img = Bmp.parse(Bmp.encodeGray(w, h, px))
      assert(img.width == w && img.height == h, s"${w}x$h")
      assert(img.luma.toSeq == px.toSeq, s"${w}x$h")
    }
  }

  test("top-down (negative height) BMPs decode identically to bottom-up") {
    val px = gray(8, 6)(k => (k * 41) % 256)
    val up = Bmp.parse(Bmp.encodeGray(8, 6, px))
    val down = Bmp.parse(Bmp.encodeGray(8, 6, px, topDown = true))
    assert(up.luma.toSeq == down.luma.toSeq)
    assert(up.width == down.width && up.height == down.height)
  }

  test("non-BMP, truncated, and unsupported payloads are refused loudly") {
    assert(!Bmp.isBmp("RIFFxxxxWAVE".getBytes("US-ASCII")))
    intercept[IllegalArgumentException] { Bmp.parse(Array[Byte](1, 2, 3)) }
    val ok = Bmp.encodeGray(4, 4, gray(4, 4)(identity))
    intercept[IllegalArgumentException] { Bmp.parse(ok.take(60)) } // truncated pixels
    val badBpp = ok.clone(); badBpp(28) = 8 // claim 8bpp
    val e = intercept[IllegalArgumentException] { Bmp.parse(badBpp) }
    assert(e.getMessage.contains("bpp"), e.getMessage)
  }

  test("pHash over decoded pixels: dup and near-dup images pair, distinct ones don't") {
    val s = spark
    // Two byte-identical images (0, 1), one near-dup with a single
    // brightened segment (2), and one structurally different (3).
    val base = gray(16, 16)(k => if ((k / 8) % 2 == 0) 40 else 220)
    val near = base.clone(); near(5) = 255 // within-segment nudge
    val diff = gray(16, 16)(k => if ((k / 8) % 2 == 0) 220 else 40)
    val records = Seq(
      MediaRecord(0L, "image", Bmp.encodeGray(16, 16, base), MediaMeta("t", "image")),
      MediaRecord(1L, "image", Bmp.encodeGray(16, 16, base), MediaMeta("t", "image")),
      MediaRecord(2L, "image", Bmp.encodeGray(16, 16, near), MediaMeta("t", "image")),
      MediaRecord(3L, "image", Bmp.encodeGray(16, 16, diff), MediaMeta("t", "image")),
      // A non-BMP image row must be excluded, not crash the stage.
      MediaRecord(4L, "image", "not a bitmap".getBytes("US-ASCII"), MediaMeta("t", "image")))
    val ds = s.createDataset(records)(Multimodal.recEnc)
    val ph = Multimodal.phashBmp(ds).toDF().withColumnRenamed("media_id", "doc_id")
    assert(ph.count() == 4, "the non-BMP row is filtered, the rest hash")
    val pairs = graft.dedup.Dedup.simhashPairs(s, ph, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((0L, 1L, 0)), s"identical payloads must pair at hamming 0: $pairs")
    assert(pairs.exists(p => p._1 == 0L && p._2 == 2L),
      s"the near-dup must land within the threshold: $pairs")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L),
      s"the inverted image is ~32 bits away and must not pair: $pairs")
  }
}
