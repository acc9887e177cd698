package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The REAL decode leg of m1: ImageIO bytes→pixels on generated PNGs —
  * known solid colors and dimensions in, exact channel means and sizes
  * out — plus corrupt-byte tolerance and the real resize stage.
  */
class MultimodalImageSpec extends SparkSpec {

  import spark.implicits._

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("media_id", "data")
      .withColumn("mime", lit("image/png"))
      .withColumn("meta", struct(length(col("data")).cast("long").as("n_bytes"),
        lit("spec").as("source")))

  test("decode: generated PNGs produce exact dimensions and channel means") {
    val media = mediaDf(Seq(
      1L -> png(8, 4, 0xFF0000),   // pure red
      2L -> png(3, 5, 0x00FF00),   // pure green
      3L -> png(16, 16, 0x102030), // mixed constant
      4L -> "not an image".getBytes("UTF-8"))) // corrupt → dropped
    val feats = Multimodal.extractImageFeatures(media, targetPartitions = 2)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.keySet === Set(1L, 2L, 3L), "corrupt row must drop, not throw")
    assert(feats(1L).width === 8 && feats(1L).height === 4)
    assert(feats(1L).mean_r === 255.0 && feats(1L).mean_g === 0.0)
    assert(feats(2L).width === 3 && feats(2L).height === 5)
    assert(feats(2L).mean_g === 255.0 && feats(2L).mean_b === 0.0)
    assert(feats(3L).mean_r === 16.0 && feats(3L).mean_g === 32.0 &&
      feats(3L).mean_b === 48.0)
  }

  /** Deterministic 90×80 block-pattern image: 10×10 blocks whose
    * brightness is a hash of (seed, block row, block col) — block-aligned
    * with the 9×8 dHash grid, so the fingerprint reflects the pattern,
    * not resampling noise.
    */
  private def patterned(seed: Int, brightnessShift: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(90, 80,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    for (br <- 0 until 8; bc <- 0 until 9) {
      // real mixing (MurmurHash3), not an affine form: an affine
      // v(seed, cell) differs between seeds by a CONSTANT mod the range,
      // which preserves every local comparison and makes all patterns
      // perceptual twins of each other
      val v0 = math.abs(
        scala.util.hashing.MurmurHash3.productHash((seed, br, bc)) % 200) + 20
      val v = math.min(255, v0 + brightnessShift)
      g.setColor(new java.awt.Color(v, v, v))
      g.fillRect(bc * 10, br * 10, 10, 10)
    }
    g.dispose()
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("perceptual dedup: dHash survives rescale + brightness, separates patterns") {
    val base = patterned(1)
    // near-dups of base: globally brightened, and downscaled 3×
    val bright = patterned(1, brightnessShift = 12)
    val small = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
      val out = new java.awt.image.BufferedImage(30, 27,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = out.createGraphics()
      g2.drawImage(img, 0, 0, 30, 27, null)
      g2.dispose()
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", buf)
      buf.toByteArray
    }
    val other = patterned(2)
    val media = mediaDf(Seq(1L -> base, 2L -> bright, 3L -> small,
      4L -> other, 5L -> "junk".getBytes("UTF-8")))

    val hashes = Multimodal.imageDHashes(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.keySet === Set(1L, 2L, 3L, 4L), "corrupt row drops")
    // a global brightness shift cancels in the local comparisons exactly
    assert(hashes(1L) === hashes(2L), "dHash must be brightness-invariant")

    val pairs = Multimodal.perceptualDupPairs(media, maxDist = 10)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "brightened twin must pair with base")
    assert(pairs.contains((1L, 3L)), "rescaled twin must pair with base")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"different pattern must not pair, got $pairs")
  }

  test("resize: longer edge capped, aspect kept, small images untouched") {
    val media = mediaDf(Seq(
      1L -> png(64, 32, 0xAA5500),
      2L -> png(10, 12, 0x123456),  // under the cap → byte-identical
      3L -> "garbage".getBytes("UTF-8"))) // corrupt → passes through
    val out = Multimodal.resizeImages(media, maxDim = 16)
    val rows = out.select("media_id", "data").as[(Long, Array[Byte])]
      .collect().toMap
    val big = Multimodal.decodeImage(rows(1L)).get
    assert(big.width === 16 && big.height === 8, "64×32 → 16×8 at maxDim 16")
    // solid color survives bilinear resampling exactly
    assert(big.mean_r === 0xAA.toDouble && big.mean_g === 0x55.toDouble)
    assert(rows(2L).sameElements(png(10, 12, 0x123456)), "no upscale, no re-encode")
    assert(rows(3L).sameElements("garbage".getBytes("UTF-8")),
      "corrupt payload passes through a resize stage unchanged")
    // frame shape intact for the next pipeline stage
    assert(out.columns.toSeq === Seq("media_id", "mime", "data", "meta"))
    val meta = out.filter(col("media_id") === 1L)
      .select(col("meta.n_bytes"), col("mime")).head()
    assert(meta.getLong(0) === rows(1L).length.toLong)
    assert(meta.getString(1) === "image/png")
  }
}
