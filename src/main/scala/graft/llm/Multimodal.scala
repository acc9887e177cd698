package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by partition-batched decode /
  * feature-extract stages.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libs): `decodeStub` produces deterministic fake features derived from
  * the bytes. Everything around it — the schema, the binary column, the
  * batched `mapPartitions` stage shape, the size-aware repartitioning —
  * is the real Spark-side design: at 100 TB the decode stage is the
  * expensive part, so records are batched per partition (amortizing
  * per-batch model/codec setup, the Scala analog of `mapInPandas`) and
  * partitions are sized by media bytes, not row count.
  */
object Multimodal {

  /** media record: id + opaque payload + typed metadata */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("data", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("source", StringType))))))

  /** Build a media table from the documents table: payload = utf-8 bytes
    * of the text (a deterministic stand-in for real image/audio bytes).
    */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("application/fake").as("mime"),
      encode(col("text"), "UTF-8").as("data"),
      struct(length(col("text")).cast("long").as("n_bytes"),
        col("source").as("source")).as("meta"))

  final case class MediaFeatures(media_id: Long, n_bytes: Long,
                                 first_byte: Int, last_byte: Int,
                                 byte_sum32: Long)

  /** STUB decode: deterministic fake features from the payload bytes.
    * Replace the body with a real codec (JPEG decode, resample, frame
    * sample) — the stage shape stays identical.
    */
  def decodeStub(data: Array[Byte]): MediaFeatures =
    MediaFeatures(0L, data.length,
      if (data.nonEmpty) data(0) & 0xFF else 0,
      if (data.nonEmpty) data(data.length - 1) & 0xFF else 0,
      data.take(32).foldLeft(0L)((a, b) => a + (b & 0xFF)))

  /** Partition-batched feature extraction: one "codec" per partition,
    * records processed in a tight loop (the mapInPandas-equivalent batch
    * shape). Input is round-robin repartitioned: media sizes are heavily
    * skewed, and range-partitioning by size would CONCENTRATE the largest
    * payloads into one partition — random placement balances total decode
    * bytes per executor in expectation.
    */
  def extractFeatures(media: DataFrame, targetPartitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val sized =
      if (targetPartitions > 0) media.repartition(targetPartitions)
      else media
    sized.select(col("media_id"), col("data")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup happens HERE (codec init, model load, …)
        it.map { case (id, data) => decodeStub(data).copy(media_id = id) }
      }
  }

  final case class Frame(media_id: Long, frame_idx: Int, offset: Long,
                         frame_sum: Long)

  /** Frame sampling (the video path): fixed-stride windows over the
    * payload, one output row per sampled frame — a flatMap inside the same
    * partition-batched stage, so the row explosion happens DISTRIBUTED
    * (never a driver loop) and a real frame decoder drops into the window
    * loop unchanged. Only full windows are emitted. `frame_sum` stands in
    * for per-frame features.
    */
  def sampleFrames(media: DataFrame, frameSize: Int, stride: Int,
                   maxFrames: Int, targetPartitions: Int = 0): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    val sized =
      if (targetPartitions > 0) media.repartition(targetPartitions)
      else media
    sized.select(col("media_id"), col("data")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, data) =>
          Iterator.range(0, maxFrames)
            .map(i => (i, i.toLong * stride))
            .takeWhile { case (_, off) => off + frameSize <= data.length }
            .map { case (i, off) =>
              var s = 0L
              var j = off.toInt
              while (j < off + frameSize) { s += data(j) & 0xFF; j += 1 }
              Frame(id, i, off, s)
            }
        }
      }
  }

  /** Resize stub (the image path): keep every `factor`-th byte — the
    * stage shape of a real resize (smaller binary out, metadata updated in
    * place, same batched stage). */
  def resizeStub(media: DataFrame, factor: Int): DataFrame = {
    val shrink = udf { (data: Array[Byte]) =>
      Array.tabulate(data.length / factor)(i => data(i * factor))
    }
    media.withColumn("data", shrink(col("data")))
      .withColumn("meta", struct(length(col("data")).cast("long").as("n_bytes"),
        col("meta.source").as("source")))
  }

  // --------------------------------------------------------------------
  // REAL image decode — the JDK's javax.imageio needs no native codecs
  // (PNG/JPEG/BMP/GIF), so this leg of m1 runs actual bytes→pixels in
  // this sandbox. Same batched mapPartitions stage shape as the stub:
  // swap `decodeImage` for a heavier codec and nothing else moves.
  // --------------------------------------------------------------------

  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
                                 mean_r: Double, mean_g: Double, mean_b: Double)

  /** THE safe decode — one definition for every ImageIO entry point
    * (features, dHash, resize). None for undecodable bytes: corrupt
    * records are a fact of any 100 TB media crawl, and a throw here
    * would fail the task 4× and abort the whole job — NonFatal, not
    * just IOException, because hostile payloads surface as CMMException
    * / IllegalArgumentException / ArrayIndexOutOfBounds from inside
    * ImageIO. Disables ImageIO's DISK cache first (JVM-global,
    * idempotent): the default wraps every read/write in a temp FILE on
    * executor-local disk — one create+delete per record of pure
    * overhead when the bytes are already in memory.
    */
  private def readImage(data: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).filter(i => i.getWidth > 0 && i.getHeight > 0)
  }

  /** Decode one payload into summary features ([[readImage]] contract:
    * corrupt bytes drop, never throw).
    */
  def decodeImage(data: Array[Byte]): Option[ImageFeatures] = {
    readImage(data).map { i =>
      val (w, h) = (i.getWidth, i.getHeight)
      // one bulk grab, not w×h getRGB calls
      val px = i.getRGB(0, 0, w, h, null, 0, w)
      var (r, g, b) = (0L, 0L, 0L)
      var j = 0
      while (j < px.length) {
        r += (px(j) >> 16) & 0xFF; g += (px(j) >> 8) & 0xFF; b += px(j) & 0xFF
        j += 1
      }
      val n = w.toLong * h
      ImageFeatures(0L, w, h, r.toDouble / n, g.toDouble / n, b.toDouble / n)
    }
  }

  /** Real-decode twin of [[extractFeatures]]: dimensions + per-channel
    * means via ImageIO, per-partition batched, undecodable rows dropped.
    */
  def extractImageFeatures(media: DataFrame, targetPartitions: Int = 0): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val sized =
      if (targetPartitions > 0) media.repartition(targetPartitions)
      else media
    sized.select(col("media_id"), col("data")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, data) =>
        decodeImage(data).map(_.copy(media_id = id))
      })
  }

  /** Deterministic synthetic PNG: a 90×80 grid of 10×10 blocks whose
    * brightness is MurmurHash3(pattern, row, col) — plus a global
    * brightness shift, which dHash's local comparisons cancel. Two
    * images with the same `pattern` are perceptual twins at any shifts;
    * different patterns are far apart. The media generator for the m4
    * entry and the specs: the testdata ships no images, so the demo
    * corpus is rendered ON THE EXECUTORS (headless AWT), which also
    * makes the decode stage's input real PNG bytes end-to-end.
    */
  def syntheticPatternPng(pattern: Long, brightnessShift: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(90, 80,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    for (br <- 0 until 8; bc <- 0 until 9) {
      val v0 = math.abs(scala.util.hashing.MurmurHash3
        .productHash((pattern, br, bc)) % 200) + 20
      val v = math.min(255, v0 + brightnessShift)
      g.setColor(new java.awt.Color(v, v, v))
      g.fillRect(bc * 10, br * 10, 10, 10)
    }
    g.dispose()
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  /** 64-bit difference hash (dHash) — the classic perceptual image
    * fingerprint: resample the decoded image to a 9×8 luma grid
    * (bilinear), set bit r·8+c when cell (r,c) is darker than its right
    * neighbor. Robust to re-encoding, scaling, and mild global
    * brightness/contrast shifts (the bit is a LOCAL comparison, so a
    * constant added to every pixel cancels); Hamming distance between
    * hashes tracks visual difference. None for undecodable bytes.
    */
  def dHash(data: Array[Byte]): Option[Long] = {
    readImage(data).map { i =>
      val grid = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = grid.createGraphics()
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(i, 0, 0, 9, 8, null)
      g2.dispose()
      val px = grid.getRGB(0, 0, 9, 8, null, 0, 9)
      def luma(p: Int): Int =
        (((p >> 16) & 0xFF) * 299 + ((p >> 8) & 0xFF) * 587 + (p & 0xFF) * 114) / 1000
      var h = 0L
      for (r <- 0 until 8; c <- 0 until 8)
        if (luma(px(r * 9 + c)) < luma(px(r * 9 + c + 1)))
          h |= 1L << (r * 8 + c)
      h
    }
  }

  /** (media_id, simhash) perceptual fingerprints — the column is named
    * `simhash` so the d4 Hamming machinery applies unchanged. Same
    * batched stage shape as [[extractImageFeatures]]; undecodable rows
    * drop.
    */
  def imageDHashes(media: DataFrame, targetPartitions: Int = 0): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val sized =
      if (targetPartitions > 0) media.repartition(targetPartitions)
      else media
    sized.select(col("media_id"), col("data")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, data) => dHash(data).map(id -> _) })
      .toDF("media_id", "simhash")
  }

  /** Perceptual near-duplicate image pairs: real decode → dHash → the d4
    * pigeonhole chunk equi-join (any pair within Hamming `maxDist` shares
    * at least one exact chunk of the fingerprint split `maxDist`+1 ways).
    * The 100 TB shape: pixels never shuffle — after the batched decode
    * stage only 8-byte fingerprints move, and candidate generation is an
    * equi-join, not an all-pairs scan.
    */
  def perceptualDupPairs(media: DataFrame, maxDist: Int,
                         targetPartitions: Int = 0): DataFrame =
    Dedup.hammingPairs(imageDHashes(media, targetPartitions), maxDist,
      bits = 64, "media_id")

  /** The pairing stage of [[perceptualDupPairs]] alone, over an
    * already-computed (media_id, simhash) fingerprint table — split out
    * so the post-decode tail of m4 is hash-checkable: persist the
    * fingerprints, pair through the persisted bytes, and let a SQL
    * oracle replay the pigeonhole chunk equi-join + bit_count filter
    * over the same parquet (the d4b discipline applied to m4; the decode
    * itself has no SQL-expressible oracle and stays spec-verified).
    */
  def pairsFromFingerprints(fingerprints: DataFrame, maxDist: Int): DataFrame =
    Dedup.hammingPairs(fingerprints, maxDist, bits = 64, "media_id")

  /** Real resize: scale so the longer edge is ≤ `maxDim` (never
    * upscales), re-encode as PNG. Returns the media frame shape — id,
    * mime, data, meta — so it drops into the same pipeline slot as
    * [[resizeStub]]. Undecodable payloads pass through UNCHANGED (same
    * rationale as [[decodeImage]]: a resize stage must not drop or kill
    * on corrupt records; a downstream decode stage counts them).
    */
  def resizeImages(media: DataFrame, maxDim: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("mime"), col("data"), col("meta.source"))
      .as[(Long, String, Array[Byte], String)]
      .mapPartitions(_.map { case (id, mime, data, source) =>
        val resized = for {
          img <- readImage(data)
          if math.max(img.getWidth, img.getHeight) > maxDim
        } yield {
          val s = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
          val (w, h) = (math.max(1, (img.getWidth * s).round.toInt),
            math.max(1, (img.getHeight * s).round.toInt))
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = out.createGraphics()
          g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(img, 0, 0, w, h, null)
          g2.dispose()
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", buf)
          ("image/png", buf.toByteArray)
        }
        val (outMime, outData) = resized.getOrElse((mime, data))
        (id, outMime, outData, outData.length.toLong, source)
      })
      .toDF("media_id", "mime", "data", "n_bytes", "source")
      .select(col("media_id"), col("mime"), col("data"),
        struct(col("n_bytes"), col("source")).as("meta"))
  }
}
