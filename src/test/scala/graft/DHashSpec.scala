package graft

import graft.multimodal.Multimodal

/** dHash (q260 surface): the exact shift invariance the query's
  * group-closure facts rely on, cross-class distinctness, orientation
  * sensitivity, and the clamp guard. */
class DHashSpec extends SparkSpec {

  private def classImg(seed: Long) = javax.imageio.ImageIO.read(
    new java.io.ByteArrayInputStream(
      Multimodal.encodeTextureBmp(32, 24, seed)))

  test("the q242 gradient is dHash-degenerate — why q260 uses textures") {
    // monotonic-in-x rows compare false everywhere: every seed → 0L
    val hs = (0L to 6L).map { s =>
      Multimodal.dHash64(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.encodeBmp(32, 24, s))))
    }
    assert(hs.forall(_ == 0L))
  }

  test("brightness +5 changes every pixel but no dHash bit") {
    (0L to 6L).foreach { seed =>
      val img = classImg(seed)
      val shifted = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(
          Multimodal.encodePng(Multimodal.brightnessShift(img, 5))))
      assert(Multimodal.pixelMd5(img) != Multimodal.pixelMd5(shifted),
        s"class $seed: shift did not change the raster")
      assert(Multimodal.dHash64(img) == Multimodal.dHash64(shifted),
        s"class $seed: dHash lost shift invariance")
    }
  }

  test("the seven gradient classes have pairwise-distinct hashes") {
    val hs = (0L to 6L).map(s => Multimodal.dHash64(classImg(s)))
    assert(hs.distinct.size == 7, s"class dhash collision: $hs")
  }

  test("horizontal flip flips comparison bits (orientation-sensitive)") {
    val img = classImg(3)
    val flipped = new java.awt.image.BufferedImage(
      img.getWidth, img.getHeight,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      flipped.setRGB(img.getWidth - 1 - x, y, img.getRGB(x, y))
    assert(Multimodal.dHash64(img) != Multimodal.dHash64(flipped))
  }

  test("clamp guard: a shift that would saturate is rejected loudly") {
    val white = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) white.setRGB(x, y, 0xffffff)
    intercept[IllegalArgumentException] {
      Multimodal.brightnessShift(white, 5)
    }
  }
}
