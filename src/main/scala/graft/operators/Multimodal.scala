package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing — LLM-pipeline extension (SURVEY.md §7.4).
 *
 * Media (image/video) is modeled as an opaque `binary` payload column plus
 * typed metadata, processed batch-at-a-time with `mapPartitions` over a
 * typed Dataset (the Scala analog of `mapInPandas`: one iterator per
 * partition, no per-row UDF dispatch, executor-local batching). The codec is
 * REAL: PNG encode/decode via `javax.imageio` (pure JDK, no external
 * libraries), so the oracle check exercises a genuine decode∘encode
 * round-trip — the oracle computes per-image stats arithmetically from the
 * test-pattern formula, and they only match if the codec reproduced every
 * pixel.
 *
 * At 100 TB: payloads dominate I/O, so the media table should be stored with
 * the payload in its own parquet column (column pruning skips it when only
 * metadata is queried) and partitioned by a content-size band so decode
 * batches are balanced across executors.
 */
object Multimodal {

  // in-memory ImageIO (the default spills codec scratch to temp FILES —
  // per-row disk I/O inside an executor hot loop)
  ImageIO.setUseCache(false)

  case class MediaRow(doc_id: Long, payload: Array[Byte], format: String)
  case class ImageFeatures(doc_id: Long, format: String, width: Int,
                           height: Int, gray_sum: Long)
  case class FrameFeatures(doc_id: Long, frame_idx: Int, width: Int,
                           height: Int, gray_sum: Long)

  /** Deterministic test-pattern dimensions — pure functions of the doc id so
    * a SQL oracle can reproduce the per-image stats arithmetically. */
  def imgWidth(docId: Long): Int = 8 + (docId % 9).toInt
  def imgHeight(docId: Long): Int = 8 + (docId % 7).toInt
  def numFrames(docId: Long): Int = 1 + (docId % 6).toInt

  /** Pixel formula of the synthetic pattern: `(31·doc + 17·frame + 7x + 13y) mod 256`. */
  private def pixel(docId: Long, frameIdx: Int, x: Int, y: Int): Int =
    ((docId * 31 + frameIdx * 17L + 7L * x + 13L * y) % 256).toInt

  /** Render one grayscale PNG frame of the deterministic pattern. */
  def renderPng(docId: Long, frameIdx: Int): Array[Byte] = {
    val (w, h) = (imgWidth(docId), imgHeight(docId))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixel(docId, frameIdx, x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode (pure-JDK `javax.imageio`): bytes → (width, height,
    * sum of band-0 samples). Fails loudly on undecodable payloads — silent
    * nulls would let a corrupt shard pass the pipeline unnoticed. */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Long) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (w, h, sum)
  }

  /** Image ingest: one PNG-encoded pattern image per document. Encoding runs
    * inside `mapPartitions` on the executors — the driver never sees a
    * payload byte. */
  def renderImageTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, renderPng(id, 0), "png")))
      .toDF()
  }

  /** Batch feature extraction over an image table: one iterator-to-iterator
    * `mapPartitions` pass (streaming within the partition, constant memory),
    * each payload run through the REAL `javax.imageio` decode. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions {
      _.map { r =>
        val (w, h, sum) = decodeImage(r.payload)
        ImageFeatures(r.doc_id, r.format, w, h, sum)
      }
    }
  }

  case class PatchRow(doc_id: Long, patch_y: Int, patch_x: Int,
                      n_pixels: Long, sum_intensity: Long)

  /** ViT-style PATCHIFICATION — the "image → patch sequence" step every
    * vision-transformer ingest runs before embedding: pixel (x, y) joins
    * patch `(y DIV p, x DIV p)`, and the manifest reports each patch's
    * true pixel count and band-0 intensity sum. Edge patches are SMALLER
    * when `p` does not divide the image — kept as-is (padding is the
    * trainer's policy; the manifest must report what the pixels actually
    * are, and the count column is what makes the downstream mean exact).
    * REAL `javax.imageio` decode per payload inside one
    * iterator-to-iterator `mapPartitions` (the [[extractFeatures]]
    * codec-seam contract); everything after the seam is plain rows. */
  def patchGrid(spark: SparkSession, media: DataFrame,
      p: Int = 4): Dataset[PatchRow] = {
    import spark.implicits._
    require(p >= 1, "patch size must be positive")
    media.as[MediaRow].mapPartitions { it =>
      it.flatMap { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.payload))
        require(img != null, "payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val px = (w + p - 1) / p
        val py = (h + p - 1) / p
        val sums = Array.ofDim[Long](py * px)
        val cnts = Array.ofDim[Long](py * px)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val cell = (y / p) * px + (x / p)
            sums(cell) += raster.getSample(x, y, 0)
            cnts(cell) += 1
            x += 1
          }
          y += 1
        }
        (0 until py * px).iterator.map(c =>
          PatchRow(r.doc_id, c / px, c % px, cnts(c), sums(c)))
      }
    }
  }

  case class GradientFeatures(doc_id: Long, width: Int, height: Int,
                              grad_energy: Long)

  /** Total-variation gradient energy of a decoded image: Σ|I(x+1,y)−I(x,y)|
    * + Σ|I(x,y+1)−I(x,y)| over band 0 — the Sobel-lite edge-mass scalar
    * (flat fills ≈ 0, texture/noise high) used to triage screenshots vs
    * photos before any model sees the pixels. */
  def gradientEnergy(img: BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    var e = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = raster.getSample(x, y, 0)
        if (x + 1 < w) e += math.abs(raster.getSample(x + 1, y, 0) - g)
        if (y + 1 < h) e += math.abs(raster.getSample(x, y + 1, 0) - g)
        x += 1
      }
      y += 1
    }
    e
  }

  /** Batch gradient-energy extraction: the [[extractFeatures]] shape (one
    * iterator-to-iterator `mapPartitions`, REAL `javax.imageio` decode per
    * payload) emitting the total-variation scalar — green means the codec
    * round-trip AND the neighborhood arithmetic both survived. */
  def extractGradientFeatures(spark: SparkSession,
      media: DataFrame): Dataset[GradientFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions {
      _.map { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.payload))
        require(img != null, "payload is not a decodable image")
        GradientFeatures(r.doc_id, img.getWidth, img.getHeight,
          gradientEnergy(img))
      }
    }
  }

  case class MotionFeatures(doc_id: Long, n_frames: Int, max_frame_delta: Long)

  /** Motion proxy over a packed video payload: demux the container, run
    * EVERY frame through the real `javax.imageio` decode, and report the
    * maximum adjacent-frame brightness-sum delta — the scene-change /
    * static-clip triage scalar, computed without ever materializing more
    * than one frame at a time (iterator-to-iterator, constant memory). */
  def extractMotionFeatures(spark: SparkSession,
      media: DataFrame): Dataset[MotionFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions {
      _.map { r =>
        var prev = -1L
        var maxDelta = 0L
        var n = 0
        unpackFrames(r.payload).foreach { case (_, png) =>
          val (_, _, sum) = decodeImage(png)
          if (prev >= 0 && math.abs(sum - prev) > maxDelta)
            maxDelta = math.abs(sum - prev)
          prev = sum
          n += 1
        }
        MotionFeatures(r.doc_id, n, maxDelta)
      }
    }
  }

  /** Pack PNG frames into a length-prefixed container (the demuxable "video"
    * payload: `[int32 length][png bytes]`*). Container framing is pipeline
    * code; the per-frame codec stays `javax.imageio`. */
  def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    frames.foreach { f => dos.writeInt(f.length); dos.write(f) }
    dos.flush()
    bos.toByteArray
  }

  /** Demux a length-prefixed container into (frame_idx, frame bytes) —
    * an iterator, so frames stream through without materializing the list. */
  def unpackFrames(payload: Array[Byte]): Iterator[(Int, Array[Byte])] = {
    val dis = new DataInputStream(new ByteArrayInputStream(payload))
    Iterator.from(0)
      .takeWhile(_ => dis.available() >= 4)
      .map { i =>
        val len = dis.readInt()
        val buf = new Array[Byte](len)
        dis.readFully(buf)
        (i, buf)
      }
  }

  /** Video ingest: each document becomes a multi-frame container of
    * per-frame PNGs (frame count varies by doc — realistic skew). */
  def renderVideoTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        MediaRow(id, packFrames((0 until numFrames(id)).map(renderPng(id, _))), "vid")
      })
      .toDF()
  }

  /**
   * Lake-side image ingest, step 1: materialize one PNG FILE per document
   * under `dir` (executors write their own partitions — the driver never
   * sees a payload byte; on a cluster `dir` is shared storage). This is the
   * layout-build step of the real multimodal ingest path, where media
   * arrives as files, not table rows.
   */
  def writeImageFiles(spark: SparkSession, docs: DataFrame, dir: String): Unit = {
    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    docs.select(col("doc_id")).as[Long].foreachPartition { (ids: Iterator[Long]) =>
      ids.foreach { id =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"doc_$id.png"), renderPng(id, 0))
      }
    }
  }

  /**
   * Lake-side image ingest, step 2: Spark's `binaryFile` source reads the
   * directory as (path, modificationTime, length, content) rows; doc ids
   * are recovered from filenames and every payload goes through the REAL
   * `javax.imageio` decode. The binaryFile source splits by FILE, so decode
   * parallelism equals file count — exactly how a production image corpus
   * is ingested before being compacted into payload-column parquet.
   */
  def ingestImageDir(spark: SparkSession, dir: String): Dataset[ImageFeatures] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png")
      .load(dir)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.png", 1).cast("long").as("doc_id"),
        col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions {
        _.map { case (id, bytes) =>
          val (w, h, sum) = decodeImage(bytes)
          ImageFeatures(id, "png", w, h, sum)
        }
      }
  }

  case class HashedImage(img_id: Long, h1: Long, h2: Long)

  /** Nearest-neighbor sample columns for the dHash grid: 9 x-positions. */
  private def gridX(w: Int, i: Int): Int = i * w / 9
  /** Nearest-neighbor sample rows for the dHash grid: 8 y-positions. */
  private def gridY(h: Int, j: Int): Int = j * h / 8

  /**
   * 64-bit difference hash (dHash) of a decoded image: nearest-neighbor
   * sample a 9×8 grid, emit `bit(j,i) = [p(x_{i+1},y_j) > p(x_i,y_j)]` —
   * 8 horizontal-gradient bits per row × 8 rows. Gradient comparisons are
   * LOCAL (no global mean, unlike aHash), so editing one pixel can flip at
   * most the ≤3 comparisons that touch it — the bound that makes planted
   * perturbations certifiably land under a small Hamming threshold.
   * Returned as two 32-bit halves in BIGINTs (rows 0–3, rows 4–7): a
   * single 64-bit value would overflow the sign bit, and the halves are
   * what the band split wants anyway.
   */
  def dHash64(img: BufferedImage): (Long, Long) = {
    val (w, h, raster) = (img.getWidth, img.getHeight, img.getRaster)
    var h1 = 0L; var h2 = 0L
    var j = 0
    while (j < 8) {
      val y = gridY(h, j)
      var i = 0
      while (i < 8) {
        val bit = if (raster.getSample(gridX(w, i + 1), y, 0) >
          raster.getSample(gridX(w, i), y, 0)) 1L else 0L
        val pos = (3 - (j % 4)) * 8 + (7 - i)
        if (j < 4) h1 |= bit << pos else h2 |= bit << pos
        i += 1
      }
      j += 1
    }
    (h1, h2)
  }

  /** Pixel formula of the DEDUP test pattern: unlike [[pixel]]'s shared
    * linear gradient (which makes every doc's dHash near-identical — a
    * synthetic worst case that degenerates any perceptual hash), a
    * QUADRATIC mix mod a prime (`s²+s mod 251`, s linear in doc/x/y)
    * gives each doc an effectively independent 64-bit signature —
    * P(Hamming ≤ 3 | unrelated docs) ≈ 2⁻⁴⁸, so the pair set is exactly
    * the planted variants, the realistic-corpus shape. All arithmetic
    * stays < 2³¹ (d is reduced mod 251 first) so the SQL oracle computes
    * the identical values in checked BIGINT. */
  private def dedupPixel(docId: Long, x: Int, y: Int): Int = {
    val s = (docId % 251) * 131 + 31L * x + 17L * y
    ((s * s + s) % 251).toInt
  }

  /** Render one grayscale PNG of the dedup test pattern. */
  def renderDHashPng(docId: Long): Array[Byte] = {
    val (w, h) = (imgWidth(docId), imgHeight(docId))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, dedupPixel(docId, x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Render the near-dup PLANT: the document's dedup-pattern image with ONE
    * pixel — the grid sample at (x₄, y₃) — shifted by +128 mod 256. The
    * perturbed pixel serves at most 2 consecutive grid slots (only w=8
    * collides slots 0/1), so at most 3 row-3 gradient bits change: the
    * planted pair sits at Hamming ≤ 3 BY CONSTRUCTION, never by luck. */
  def renderPerturbedPng(docId: Long): Array[Byte] = {
    val img = ImageIO.read(new ByteArrayInputStream(renderDHashPng(docId)))
    val (px, py) = (gridX(img.getWidth, 4), gridY(img.getHeight, 3))
    val raster = img.getRaster
    raster.setSample(px, py, 0, (raster.getSample(px, py, 0) + 128) % 256)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /**
   * Media table for the near-dup pipeline: every document's pattern image
   * plus, for each `doc_id % plantMod == 0`, a perturbed variant under
   * `img_id = doc_id + variantOffset` — the deterministic dirty-data plant
   * (x14's perturbed-embedding pattern, applied to pixels) that keeps the
   * perceptual-dedup query non-vacuous at every SF.
   */
  def renderImageTableWithVariants(spark: SparkSession, docs: DataFrame,
      plantMod: Long = 97L, variantOffset: Long = 1000000000L): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val base = MediaRow(id, renderDHashPng(id), "png")
        if (id % plantMod == 0)
          Iterator(base, MediaRow(id + variantOffset, renderPerturbedPng(id), "png"))
        else Iterator(base)
      })
      .toDF()
  }

  /** Decode (REAL `javax.imageio`) + dHash every payload in one
    * iterator-to-iterator `mapPartitions` pass. */
  def perceptualHashes(spark: SparkSession, media: DataFrame): Dataset[HashedImage] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions {
      _.map { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.payload))
        require(img != null, "payload is not a decodable image")
        val (a, b) = dHash64(img)
        HashedImage(r.doc_id, a, b)
      }
    }
  }

  /**
   * Perceptual near-duplicate pairs at `Hamming ≤ maxHamming` via the
   * 4×16-bit band split of the 64-bit dHash — [[x03 SimHash]]'s banding
   * argument on image hashes: with 4 disjoint bands, any pair within
   * Hamming ≤ 3 shares at least one full band (pigeonhole), so candidates
   * come ONLY from per-band equality buckets (shuffle bounded by
   * images × 4, never the all-pairs square) and the exact Hamming check
   * on candidates has zero false negatives. At larger thresholds raise
   * the band count to t+1 (and widen the hash) — the standard
   * LSH-banding trade, same as the text SimHash path.
   */
  def perceptualNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4 bands guarantee recall only to Hamming 3, got $maxHamming")
    val banded = hashes.select(col("img_id"), col("h1"), col("h2"),
      explode(array(
        struct(lit(0).as("band"), expr("h1 DIV 65536").as("v")),
        struct(lit(1).as("band"), expr("h1 % 65536").as("v")),
        struct(lit(2).as("band"), expr("h2 DIV 65536").as("v")),
        struct(lit(3).as("band"), expr("h2 % 65536").as("v")))).as("b"))
      .select(col("img_id"), col("h1"), col("h2"),
        col("b.band").as("band"), col("b.v").as("v"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.img_id") < col("b.img_id"))
      .select(col("a.img_id").as("img_a"), col("b.img_id").as("img_b"),
        (expr("CAST(bit_count(a.h1 ^ b.h1) AS INT)") +
          expr("CAST(bit_count(a.h2 ^ b.h2) AS INT)")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  case class AudioFeatures(doc_id: Long, sample_rate: Int, n_samples: Long,
                           sum_abs: Long, peak: Int)

  /** Deterministic audio-pattern length — a pure function of the doc id so
    * the SQL oracle can reproduce the per-clip stats arithmetically. */
  def audioSamples(docId: Long): Int = 64 + (docId % 37).toInt

  /** Sample formula of the synthetic PCM pattern: a signed 16-bit value
    * `((doc·31 + 7t) mod 65536) − 32768` — integer-exact, covers the full
    * amplitude range, and reproducible in SQL. */
  def sampleVal(docId: Long, t: Int): Int =
    (((docId * 31 + 7L * t) % 65536) - 32768).toInt

  /** Render one mono 16-bit little-endian PCM WAV clip of the deterministic
    * pattern via the REAL pure-JDK codec (`javax.sound.sampled` writes the
    * RIFF container — no hand-rolled headers). */
  def renderWav(docId: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = audioSamples(docId)
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val v = sampleVal(docId, t)
      pcm(2 * t) = (v & 0xFF).toByte
      pcm(2 * t + 1) = ((v >> 8) & 0xFF).toByte
      t += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode (pure-JDK `javax.sound.sampled`): WAV bytes →
    * (sample rate, sample count, Σ|amplitude|, peak |amplitude|). Handles
    * either endianness from the container header; fails loudly on
    * undecodable or non-mono-16-bit payloads — silent nulls would let a
    * corrupt shard pass the pipeline unnoticed. */
  def decodeWav(bytes: Array[Byte]): (Int, Long, Long, Int) = {
    import javax.sound.sampled.AudioSystem
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
      s"expected mono 16-bit PCM, got $fmt")
    val data = ais.readAllBytes()
    val big = fmt.isBigEndian
    var sumAbs = 0L; var peak = 0; var n = 0L
    var i = 0
    while (i + 2 <= data.length) {
      val v =
        if (big) ((data(i) << 8) | (data(i + 1) & 0xFF)).toShort.toInt
        else ((data(i + 1) << 8) | (data(i) & 0xFF)).toShort.toInt
      val a = math.abs(v)
      sumAbs += a
      if (a > peak) peak = a
      n += 1
      i += 2
    }
    (fmt.getSampleRate.toInt, n, sumAbs, peak)
  }

  /** Audio ingest: one WAV-encoded pattern clip per document, encoded inside
    * `mapPartitions` on the executors — the driver never sees a payload
    * byte (same contract as [[renderImageTable]]). */
  def renderAudioTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, renderWav(id), "wav")))
      .toDF()
  }

  /** Batch audio feature extraction: one iterator-to-iterator
    * `mapPartitions` pass, each payload run through the REAL
    * `javax.sound.sampled` decode. */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions {
      _.map { r =>
        val (rate, n, sumAbs, peak) = decodeWav(r.payload)
        AudioFeatures(r.doc_id, rate, n, sumAbs, peak)
      }
    }
  }

  case class EnergyWindow(doc_id: Long, window_idx: Int, n_samples: Long,
                          sum_abs: Long, sum_sq: Long, peak: Int)

  /** WINDOWED ENERGY CONTOUR — the framing step every speech pipeline
    * (VAD, diarization, loudness normalization) runs before a model sees
    * audio: fixed `windowSize`-sample frames over the REAL-codec decode,
    * each reporting its exact |amplitude| sum, energy (Σ amplitude² —
    * kept as the integer sum of squares; an RMS sqrt would trade
    * exactness for nothing the threshold consumer needs), and peak. The
    * trailing partial frame reports its true sample count. One
    * iterator-to-iterator `mapPartitions` at the codec seam (the
    * [[extractAudioFeatures]] contract); everything after is plain rows. */
  def audioEnergyWindows(spark: SparkSession, media: DataFrame,
      windowSize: Int = 16): Dataset[EnergyWindow] = {
    import spark.implicits._
    require(windowSize >= 1, "window size must be positive")
    media.as[MediaRow].mapPartitions { it =>
      it.flatMap { r =>
        val samples = decodeWavSamples(r.payload)
        samples.grouped(windowSize).zipWithIndex.map { case (w, i) =>
          var sa = 0L; var sq = 0L; var pk = 0
          var j = 0
          while (j < w.length) {
            val a = math.abs(w(j))
            sa += a; sq += a.toLong * a; if (a > pk) pk = a
            j += 1
          }
          EnergyWindow(r.doc_id, i, w.length.toLong, sa, sq, pk)
        }
      }
    }
  }

  /** Raw signed 16-bit samples from a WAV payload (same decode + checks
    * as [[decodeWav]], materializing the sample stream instead of its
    * aggregates — the framing features need positions, not just sums). */
  def decodeWavSamples(bytes: Array[Byte]): Array[Int] = {
    import javax.sound.sampled.AudioSystem
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
      s"expected mono 16-bit PCM, got $fmt")
    val data = ais.readAllBytes()
    val big = fmt.isBigEndian
    val out = new Array[Int](data.length / 2)
    var i = 0
    while (i + 2 <= data.length) {
      out(i / 2) =
        if (big) ((data(i) << 8) | (data(i + 1) & 0xFF)).toShort.toInt
        else ((data(i + 1) << 8) | (data(i) & 0xFF)).toShort.toInt
      i += 2
    }
    out
  }

  case class AudioFrameFeatures(doc_id: Long, n_samples: Long, n_frames: Long,
                                max_frame_energy: Long, total_zero_crossings: Long)

  /**
   * Speech-pipeline FRAMING features — the windowed shape every audio
   * front-end (MFCC, VAD, diarization) starts from: slice each decoded
   * clip into `window`-sample frames every `stride` samples (tail frames
   * shorter than `window` are dropped — standard framing), and per frame
   * compute the INTEGER energy `Σv²` and the zero-crossing count
   * (`v·v' < 0` over in-frame neighbors). Per clip: frame count, max
   * frame energy (the VAD peak), total crossings (the voicing proxy) —
   * all integer-exact, so the SQL oracle certifies the decode AND the
   * framing arithmetic.
   *
   * Scale shape: ONE iterator-to-iterator `mapPartitions` pass — decode,
   * frame, and fold per clip without materializing frames into rows; at
   * corpus scale the payload bytes never shuffle and the output is one
   * row per clip.
   */
  def audioFrameFeatures(spark: SparkSession, media: DataFrame,
      window: Int = 32, stride: Int = 16): Dataset[AudioFrameFeatures] = {
    require(window >= 2 && stride >= 1, "window must be >=2 and stride >=1")
    import spark.implicits._
    media.as[MediaRow].mapPartitions {
      _.map { r =>
        val v = decodeWavSamples(r.payload)
        var nFrames = 0L; var maxEnergy = 0L; var zc = 0L
        var s = 0
        while (s + window <= v.length) {
          var energy = 0L
          var i = s
          while (i < s + window) {
            energy += v(i).toLong * v(i)
            if (i < s + window - 1 && v(i).toLong * v(i + 1) < 0) zc += 1
            i += 1
          }
          if (energy > maxEnergy) maxEnergy = energy
          nFrames += 1
          s += stride
        }
        AudioFrameFeatures(r.doc_id, v.length.toLong, nFrames, maxEnergy, zc)
      }
    }
  }

  /**
   * Frame sampling — the video-pipeline shape (demux → sample every k-th
   * frame → per-frame decode + features) in ONE iterator-to-iterator
   * `mapPartitions` pass. The stride cut happens at demux time, BEFORE the
   * decode: dropped frames are never decoded, shuffled, or spilled — at
   * 100 TB the decode is the dominant cost and sampling first is the
   * difference between decoding 100% and 1/stride of the corpus.
   */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      stride: Int = 2): Dataset[FrameFeatures] = {
    require(stride > 0, "stride must be positive")
    import spark.implicits._
    media.as[MediaRow].mapPartitions {
      _.flatMap { r =>
        unpackFrames(r.payload)
          .filter(_._1 % stride == 0)
          .map { case (i, fb) =>
            val (w, h, sum) = decodeImage(fb)
            FrameFeatures(r.doc_id, i, w, h, sum)
          }
      }
    }
  }

  case class HistogramFeatures(doc_id: Long, width: Int, height: Int,
                               peak_bin: Int, peak_count: Long,
                               flatness_ppm: Long)

  /**
   * Brightness-histogram census — per image, the 16-bin (v ÷ 16) band-0
   * histogram's peak bin (lowest index on ties — deterministic and
   * SQL-reproducible) and its count, plus flatness = ideal/actual peak
   * share in ppm (1e6 = perfectly flat; clipped or synthetic-fill images
   * concentrate in one bin and score low). One iterator-to-iterator
   * `mapPartitions` pass over the REAL `javax.imageio` decode; the
   * histogram folds executor-side, only 4 scalars per image ship.
   */
  def extractHistogramFeatures(spark: SparkSession,
      media: DataFrame): Dataset[HistogramFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions {
      _.map { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.payload))
        require(img != null, "payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val bins = new Array[Long](16)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { bins(raster.getSample(x, y, 0) / 16) += 1; x += 1 }
          y += 1
        }
        var peak = 0
        var i = 1
        while (i < 16) { if (bins(i) > bins(peak)) peak = i; i += 1 }
        val n = w.toLong * h
        HistogramFeatures(r.doc_id, w, h, peak, bins(peak),
          n * 1000000L / (bins(peak) * 16L))
      }
    }
  }

  case class SilenceRuns(doc_id: Long, n_samples: Long, n_runs: Long,
                         longest_run: Long, silence_ppm: Long)

  /**
   * Silence-run census — per decoded clip, the run-length structure of
   * |amplitude| < `threshold` samples: run count, longest run, and the
   * silent share in ppm. One iterator-to-iterator `mapPartitions` pass
   * with an O(1)-state run fold; at corpus scale only four scalars per
   * clip leave the executor.
   */
  def extractSilenceRuns(spark: SparkSession, media: DataFrame,
      threshold: Int = 4096): Dataset[SilenceRuns] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions {
      _.map { r =>
        val v = decodeWavSamples(r.payload)
        var runs = 0L; var longest = 0L; var cur = 0L; var silent = 0L
        var t = 0
        while (t < v.length) {
          if (math.abs(v(t)) < threshold) {
            if (cur == 0) runs += 1
            cur += 1; silent += 1
            if (cur > longest) longest = cur
          } else cur = 0
          t += 1
        }
        val ppm = if (v.length == 0) 0L else silent * 1000000L / v.length
        SilenceRuns(r.doc_id, v.length.toLong, runs, longest, ppm)
      }
    }
  }

  case class DecimatedAudio(doc_id: Long, n_samples: Long, n_kept: Long,
                            kept_abs_sum: Long, kept_checksum: Long)

  /**
   * Audio decimation (resample-by-stride) — the audio analog of
   * [[extractResizedFeatures]]: REAL `javax.sound.sampled` decode → keep
   * every `stride`-th sample, one iterator-to-iterator `mapPartitions`
   * pass. Dropped samples are decoded (the PCM frame is one block) but
   * never leave the executor — the fixed-rate output is what ships
   * downstream. Emits Σ|v| over the kept samples plus the
   * position-weighted checksum Σ(j+1)·v_j over the KEPT sequence, so the
   * oracle certifies WHICH samples were kept and in WHAT order, not just
   * their mass.
   */
  def extractDecimatedAudio(spark: SparkSession, media: DataFrame,
      stride: Int = 2): Dataset[DecimatedAudio] = {
    require(stride > 0, "stride must be positive")
    import spark.implicits._
    media.as[MediaRow].mapPartitions {
      _.map { r =>
        val v = decodeWavSamples(r.payload)
        var absSum = 0L; var chk = 0L; var kept = 0L; var t = 0
        while (t < v.length) {
          kept += 1
          absSum += math.abs(v(t).toLong)
          chk += kept * v(t)
          t += stride
        }
        DecimatedAudio(r.doc_id, v.length.toLong, kept, absSum, chk)
      }
    }
  }

  case class ResizedFeatures(doc_id: Long, src_width: Int, src_height: Int,
                             tgt_width: Int, tgt_height: Int,
                             resized_sum: Long, resized_checksum: Long)

  /** Nearest-neighbor resize of a decoded grayscale raster: target pixel
    * (tx, ty) samples source pixel (⌊tx·w/tw⌋, ⌊ty·h/th⌋) — the standard
    * floor index map, reproducible arithmetically by a SQL oracle (unlike
    * `Image.getScaledInstance`, whose kernel is implementation-defined).
    * Returns row-major resized samples. */
  def resizeNearest(img: BufferedImage, tw: Int, th: Int): Array[Int] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val out = new Array[Int](tw * th)
    var ty = 0
    while (ty < th) {
      var tx = 0
      while (tx < tw) {
        out(ty * tw + tx) = raster.getSample(tx * w / tw, ty * h / th, 0)
        tx += 1
      }
      ty += 1
    }
    out
  }

  /**
   * Batch resize — the thumbnail/normalize stage every multimodal training
   * pipeline runs before feature extraction: REAL `javax.imageio` decode →
   * nearest-neighbor downsample to a fixed target grid, one
   * iterator-to-iterator `mapPartitions` pass (constant memory; at 100 TB
   * the decode+resize is embarrassingly parallel and the fixed-size output
   * is what ships to the shuffle, never the source pixels). Emits the
   * resized pixel sum plus a position-weighted checksum Σ(i+1)·p_i over the
   * row-major grid, so the oracle certifies the index MAP, not just the
   * pixel mass.
   */
  def extractResizedFeatures(spark: SparkSession, media: DataFrame,
      tw: Int = 4, th: Int = 4): Dataset[ResizedFeatures] = {
    require(tw > 0 && th > 0, "target dims must be positive")
    import spark.implicits._
    media.as[MediaRow].mapPartitions {
      _.map { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.payload))
        require(img != null, "payload is not a decodable image")
        val px = resizeNearest(img, tw, th)
        var sum = 0L; var chk = 0L; var i = 0
        while (i < px.length) { sum += px(i); chk += (i + 1L) * px(i); i += 1 }
        ResizedFeatures(r.doc_id, img.getWidth, img.getHeight, tw, th, sum, chk)
      }
    }
  }

  case class ClippingRuns(doc_id: Long, n_samples: Long, n_clipped: Long,
                          n_runs: Long, longest_run: Long, clipped_ppm: Long)

  /**
   * Clipping census — the loudness-side twin of [[extractSilenceRuns]]:
   * per decoded clip, the run-length structure of |amplitude| ≥
   * `threshold` samples (near-full-scale = the clipping-distortion smell
   * an audio QA gate screens before transcription/training). Same REAL
   * `javax.sound.sampled` decode, same O(1)-state run fold inside one
   * iterator-to-iterator `mapPartitions` pass; five scalars per clip
   * leave the executor.
   */
  def extractClippingRuns(spark: SparkSession, media: DataFrame,
      threshold: Int = 30000): Dataset[ClippingRuns] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions {
      _.map { r =>
        val v = decodeWavSamples(r.payload)
        var runs = 0L; var longest = 0L; var cur = 0L; var clipped = 0L
        var t = 0
        while (t < v.length) {
          if (math.abs(v(t)) >= threshold) {
            if (cur == 0) runs += 1
            cur += 1; clipped += 1
            if (cur > longest) longest = cur
          } else cur = 0
          t += 1
        }
        val ppm = if (v.length == 0) 0L else clipped * 1000000L / v.length
        ClippingRuns(r.doc_id, v.length.toLong, clipped, runs, longest, ppm)
      }
    }
  }

  /** Planted letterbox geometry — pure functions of the doc id (the SQL
    * oracle reproduces them arithmetically): `top = doc mod 3` uniform
    * zero rows at the top, `bottom = doc mod 4` at the bottom; the
    * interior keeps the standard gradient pattern, whose rows/columns
    * are never uniform at these dimensions (adjacent samples differ by
    * 7 resp. 13 mod 256, and w, h ≤ 16 keep them distinct). */
  def letterboxTop(docId: Long): Int = (docId % 3).toInt
  def letterboxBottom(docId: Long): Int = (docId % 4).toInt

  /** Render the letterboxed variant of the pattern image. */
  def renderLetterboxPng(docId: Long): Array[Byte] = {
    val (w, h) = (imgWidth(docId), imgHeight(docId))
    val (top, bot) = (letterboxTop(docId), letterboxBottom(docId))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = if (y < top || y >= h - bot) 0 else pixel(docId, 0, x, y)
        raster.setSample(x, y, 0, v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Image ingest of the letterboxed pattern variant (executor-side
    * encode, same contract as [[renderImageTable]]). */
  def renderLetterboxTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, renderLetterboxPng(id), "png")))
      .toDF()
  }

  case class BorderFeatures(doc_id: Long, width: Int, height: Int,
                            top_border: Int, bottom_border: Int,
                            left_border: Int, right_border: Int)

  /**
   * Letterbox/pillarbox border detection — per decoded image, the count
   * of consecutive UNIFORM rows from the top and bottom and uniform
   * columns from the left and right (a row/column is uniform when every
   * sample in it is equal — the crop detector a vision-data pipeline
   * runs before training, since letterbox bars are dead pixels that
   * shift every downstream statistic). Scans are independent per edge
   * and capped at the full dimension; REAL `javax.imageio` decode, one
   * `mapPartitions` pass, six scalars per image leave the executor.
   */
  def extractBorderFeatures(spark: SparkSession,
      media: DataFrame): Dataset[BorderFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions {
      _.map { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.payload))
        require(img != null, "payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        def rowUniform(y: Int): Boolean = {
          val v0 = raster.getSample(0, y, 0)
          var x = 1
          while (x < w && raster.getSample(x, y, 0) == v0) x += 1
          x == w
        }
        def colUniform(x: Int): Boolean = {
          val v0 = raster.getSample(x, 0, 0)
          var y = 1
          while (y < h && raster.getSample(x, y, 0) == v0) y += 1
          y == h
        }
        var top = 0
        while (top < h && rowUniform(top)) top += 1
        var bot = 0
        while (bot < h && rowUniform(h - 1 - bot)) bot += 1
        var left = 0
        while (left < w && colUniform(left)) left += 1
        var right = 0
        while (right < w && colUniform(w - 1 - right)) right += 1
        BorderFeatures(r.doc_id, w, h, top, bot, left, right)
      }
    }
  }
}
