package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Bmp, Ppm}

import org.scalatest.funsuite.AnyFunSuite

/** The second real image container (PPM/P6) and the DCT pHash (r13
  * next-round 8): container round-trips, hostile-input refusals, the
  * decode dispatch's container-blindness, and the DCT hash's exact
  * integer properties (scale invariance, structure sensitivity). */
class PpmDctSpec extends SparkSuite {

  private def img(f: (Int, Int) => Int, w: Int = 16, h: Int = 16): Array[Int] =
    Array.tabulate(w * h)(k => f(k % w, k / w) & 0xff)

  test("PPM round-trip: encodeGray then parse returns the pixels") {
    val px = img((x, y) => x * 16 + y)
    val parsed = Ppm.parse(Ppm.encodeGray(16, 16, px))
    assert(parsed.width == 16 && parsed.height == 16)
    assert(parsed.luma.sameElements(px))
  }

  test("PPM header tolerates netpbm comments and whitespace") {
    val px = img((x, y) => (x + y) * 7)
    val bytes = Ppm.encodeGray(16, 16, px)
    // Splice a comment + extra whitespace between the magic and dims.
    val body = bytes.drop("P6\n".length)
    val noisy = "P6\n# a comment line\n  \t".getBytes("US-ASCII") ++ body
    val parsed = Ppm.parse(noisy)
    assert(parsed.luma.sameElements(px))
  }

  test("PPM refuses non-255 maxval and truncated payloads loudly") {
    val px = img((_, _) => 9)
    val good = Ppm.encodeGray(16, 16, px)
    val maxval = new String(good, "US-ASCII").replaceFirst("255", "65535").getBytes("US-ASCII")
    val e1 = intercept[IllegalArgumentException](Ppm.parse(maxval))
    assert(e1.getMessage.contains("maxval"))
    val e2 = intercept[IllegalArgumentException](Ppm.parse(good.dropRight(10)))
    assert(e2.getMessage.contains("truncated"))
  }

  test("decodeRaster is container-blind: BMP and PPM of the same pixels decode equal") {
    val px = img((x, y) => x * y % 251)
    val viaBmp = Multimodal.decodeRaster(Bmp.encodeGray(16, 16, px))
    val viaPpm = Multimodal.decodeRaster(Ppm.encodeGray(16, 16, px))
    assert(viaBmp.luma.sameElements(viaPpm.luma))
    assert(viaBmp.width == viaPpm.width && viaBmp.height == viaPpm.height)
    val e = intercept[RuntimeException](Multimodal.decodeRaster(Array[Byte](1, 2, 3)))
    assert(e.getMessage.contains("neither"))
  }

  private def dctOf(px: Array[Int], w: Int = 16, h: Int = 16): Long = {
    val media = spark.createDataset(Seq(Multimodal.MediaRecord(
      0L, "image", Bmp.encodeGray(w, h, px),
      Multimodal.MediaMeta("t", "image"))))(Multimodal.recEnc)
    Multimodal.dctPhash(media).collect().head.simhash
  }

  test("dctPhash: deterministic, container-blind, DC excluded") {
    val px = img((x, y) => (x * 31 + y * 17) % 256)
    val h1 = dctOf(px)
    assert(h1 == dctOf(px))
    assert((h1 & (1L << 63)) == 0L, "only 63 AC bits may be set")
    val viaPpm = Multimodal.dctPhash(spark.createDataset(Seq(Multimodal.MediaRecord(
      0L, "image", Ppm.encodeGray(16, 16, px),
      Multimodal.MediaMeta("t", "image"))))(Multimodal.recEnc))
      .collect().head.simhash
    assert(h1 == viaPpm, "same pixels must hash identically through either container")
  }

  test("dctPhash is exactly invariant under brightness scaling") {
    // Doubling every pixel doubles every coefficient AND the median —
    // all integer, all ordering-preserving — so the hash is bit-equal.
    val px = img((x, y) => (x * 13 + y * 29) % 120)
    assert(dctOf(px) == dctOf(px.map(_ * 2)))
  }

  test("dctPhash sees structure, not just mass: transposed stripes differ") {
    val hStripes = img((_, y) => if (y % 2 == 0) 200 else 0)
    val vStripes = img((x, _) => if (x % 2 == 0) 200 else 0)
    assert(dctOf(hStripes) != dctOf(vStripes),
      "equal-mass images with different spatial structure must hash apart")
  }

  test("dctPhash folds multiple-of-16 dims by box sums and refuses others") {
    // A 32x32 image that is each 16x16 pixel duplicated 2x2 must hash
    // exactly like the 16x16 original (box sums = 4x every pixel — a
    // constant scale on every coefficient).
    val base = img((x, y) => (x * 7 + y * 3) % 256)
    val up = img((x, y) => base((y / 2) * 16 + (x / 2)), w = 32, h = 32)
    assert(dctOf(base) == dctOf(up, w = 32, h = 32))
    val e = intercept[org.apache.spark.SparkException](dctOf(img((x, y) => x + y, w = 8, h = 8), w = 8, h = 8))
    assert(String.valueOf(e.getMessage).contains("multiple of 16") ||
      String.valueOf(e.getCause).contains("multiple of 16"))
  }
}
