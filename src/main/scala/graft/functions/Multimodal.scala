package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.stream.ImageInputStream
import javax.imageio.{IIOImage, ImageIO}

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque `binary` columns with typed
  * metadata, plus the decode / feature-extract / resize / frame-sample
  * paths a training-data pipeline needs.
  *
  * The codecs are REAL: `javax.imageio` ships PNG/JPEG/BMP/GIF readers
  * and writers in the JDK, so images encode and decode with zero extra
  * dependencies — single-frame PNG for pixel statistics, multi-frame
  * (animated) GIF for the video-like frame-count/frame-sample path. The
  * Spark-side machinery is the JVM analog of `mapInPandas`: batched
  * `mapPartitions` (decode batches, not rows, to bound task memory and
  * amortize per-batch setup), typed output encoders, and metadata-first-
  * then-drop-the-bytes column discipline.
  *
  * Scale notes: media bytes dominate row size, so (1) never shuffle the
  * binary column — derive metadata/features first, then drop it; (2)
  * decode is CPU-bound → `repartition(n)` before the mapPartitions to
  * use all cores; (3) `batchSize` bounds peak memory per task; (4)
  * unreadable payloads are DROPPED (lossy-decode contract), never
  * poison the job.
  *
  * The synthetic-image fixture is closed-form in the id (dims, frame
  * count, checkerboard colors below), so decoded output — including
  * exact per-channel pixel sums — is re-derivable by the DuckDB oracle
  * in pure integer arithmetic: the hash gate proves the encode→decode
  * round trip touched every real pixel.
  */
object Multimodal {

  // ------------------------------------------------- fixture arithmetic
  // Shared contract between the image generator, the specs, and the
  // oracle SQL (q34/q35). Pure integer arithmetic on the id; any change
  // here must change the oracle SQL in SparkEntry identically.

  private[graft] def dimW(id: Long): Int = (16 + (id * 7919) % 64).toInt
  private[graft] def dimH(id: Long): Int = (16 + (id * 104729) % 64).toInt
  private[graft] def nFramesOf(id: Long): Int = (1 + (id * 293) % 8).toInt
  private[graft] def colorA(id: Long): (Int, Int, Int) =
    (((id * 131) % 256).toInt, ((id * 137) % 256).toInt, ((id * 139) % 256).toInt)
  private[graft] def colorB(id: Long): (Int, Int, Int) =
    (((id * 149) % 256).toInt, ((id * 151) % 256).toInt, ((id * 157) % 256).toInt)

  /** One deterministic frame: a two-color checkerboard — cell (x+y) even
    * takes colorA, odd colorB (frame index shifts the parity so GIF
    * frames differ). Checkerboards survive PNG (lossless) bit-exactly
    * and make per-channel sums closed-form: with n0 = ⌈w·h/2⌉ even
    * cells, sum_ch = c0·n0 + c1·(w·h − n0).
    */
  private def frame(id: Long, frameIdx: Int): BufferedImage = {
    val (w, h) = (dimW(id), dimH(id))
    val (ar, ag, ab) = colorA(id)
    val (br, bg, bb) = colorB(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          if ((x + y + frameIdx) % 2 == 0) (ar << 16) | (ag << 8) | ab
          else (br << 16) | (bg << 8) | bb)
        x += 1
      }
      y += 1
    }
    img
  }

  private def encodePng(id: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(frame(id, 0), "png", bos)
    bos.toByteArray
  }

  /** Animated GIF via the JDK's sequence writer — the "video" fixture:
    * nFramesOf(id) frames, countable by any GIF reader.
    */
  private def encodeGif(id: Long): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until nFramesOf(id)).foreach(f =>
      writer.writeToSequence(new IIOImage(frame(id, f), null, null), null))
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** (id, content): REAL encoded image bytes per id — `format` is "png"
    * (single frame) or "gif" (animated, nFramesOf(id) frames). Encoding
    * runs distributed in batched mapPartitions like the decode paths.
    */
  def syntheticImages(df: DataFrame, idCol: String, format: String = "png",
                      batchSize: Int = 64)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(format == "png" || format == "gif", s"unsupported fixture format: $format")
    // encode is CPU-bound and the id list is tiny — ALWAYS spread it
    // across the executors before the codec work. Without this, a
    // single-file source (one input partition) runs every encode on one
    // thread: measured 10.9 s → 0.8 s for q34 at sf0.1 on local[32].
    df.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { ids =>
        ids.grouped(batchSize).flatMap(_.map(id =>
          (id, if (format == "gif") encodeGif(id) else encodePng(id))))
      }
      .toDF("id", "content")
  }

  // ---------------------------------------------------------- decoding

  /** Container-level metadata from a real decode: dimensions, frame
    * count (multi-frame GIF counts every frame), raster band count.
    */
  case class ImageMeta(id: Long, format: String, width: Int, height: Int,
                       nFrames: Int, channels: Int)

  /** Full-pixel statistics from a real decode of frame 0: exact integer
    * per-channel sums (grayscale rasters report the one band three
    * times). Integer sums are order-independent — safe to hash-compare.
    */
  case class ImageStats(id: Long, width: Int, height: Int, channels: Int,
                        sum_r: Long, sum_g: Long, sum_b: Long)

  private def withReader[A](bytes: Array[Byte])(f: javax.imageio.ImageReader => A): Option[A] = {
    var iis: ImageInputStream = null
    try {
      iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None // not an image: drop (lossy-decode contract)
      else {
        val r = readers.next()
        r.setInput(iis)
        try Some(f(r)) finally r.dispose()
      }
    } catch { case _: Exception => None }
    finally if (iis != null) iis.close()
  }

  private def decodeMeta(id: Long, bytes: Array[Byte]): Option[ImageMeta] =
    withReader(bytes) { r =>
      ImageMeta(id, r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0),
        r.getNumImages(true), r.read(0).getRaster.getNumBands)
    }

  private def decodeStats(id: Long, bytes: Array[Byte]): Option[ImageStats] =
    withReader(bytes) { r =>
      val img = r.read(0)
      val ra = img.getRaster
      val (w, h, bands) = (img.getWidth, img.getHeight, ra.getNumBands)
      val sums = new Array[Long](3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) {
            sums(c) += ra.getSample(x, y, math.min(c, bands - 1))
            c += 1
          }
          x += 1
        }
        y += 1
      }
      ImageStats(id, w, h, bands, sums(0), sums(1), sums(2))
    }

  /** Batched metadata decode over a binary column — header-scale work
    * per row (dims + frame walk), no full-corpus pixel materialization.
    */
  def decodeImageMeta(df: DataFrame, idCol: String = "id", contentCol: String = "content",
                      batchSize: Int = 64)(implicit spark: SparkSession): Dataset[ImageMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap {
        case (id, bytes) => decodeMeta(id, bytes)
      }))
  }

  /** Batched full-pixel decode — the heavy path; `batchSize` bounds the
    * number of decoded rasters held per task at once.
    */
  def extractImageStats(df: DataFrame, idCol: String = "id", contentCol: String = "content",
                        batchSize: Int = 64)(implicit spark: SparkSession): Dataset[ImageStats] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap {
        case (id, bytes) => decodeStats(id, bytes)
      }))
  }

  /** 64-bit average perceptual hash (aHash) split into two unsigned
    * 32-bit halves — the image-dedup signature (the LAION-era first
    * pass: identical aHash → duplicate candidate; small Hamming →
    * near-dup). EXACT-INTEGER definition so the oracle re-derives every
    * bit: gray = (r+g+b) div 3 per pixel; pixel (x,y) pools into cell
    * (i,j) = ((x·8) div w, (y·8) div h); bit(j·8+i) = 1 iff
    * cell_sum·n_pixels > total_sum·cell_n (cross-multiplied mean
    * comparison — no float, no rounding, no tie ambiguity: ties are 0).
    * The halves (bits 0–31 / 32–63) sidestep the signed-bit-63 hazard a
    * single BIGINT hash has on both engines.
    */
  case class AHash(id: Long, width: Int, height: Int, h_hi: Long, h_lo: Long)

  def aHash(df: DataFrame, idCol: String = "id", contentCol: String = "content",
            batchSize: Int = 64)(implicit spark: SparkSession): Dataset[AHash] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap {
        case (id, bytes) => decodeAHash(id, bytes)
      }))
  }

  private def decodeAHash(id: Long, bytes: Array[Byte]): Option[AHash] =
    withReader(bytes) { r =>
      val img = r.read(0)
      val ra = img.getRaster
      val (w, h, bands) = (img.getWidth, img.getHeight, ra.getNumBands)
      val cellSum = new Array[Long](64)
      val cellN = new Array[Long](64)
      var totalSum = 0L
      var y = 0
      while (y < h) {
        val cj = y * 8 / h
        var x = 0
        while (x < w) {
          val ci = x * 8 / w
          val g = (ra.getSample(x, y, 0) + ra.getSample(x, y, math.min(1, bands - 1)) +
            ra.getSample(x, y, math.min(2, bands - 1))) / 3
          val c = cj * 8 + ci
          cellSum(c) += g; cellN(c) += 1; totalSum += g
          x += 1
        }
        y += 1
      }
      val nPix = w.toLong * h
      var (hi, lo) = (0L, 0L)
      var c = 0
      while (c < 64) {
        // cross-multiplied cell-mean > pixel-mean; products ≤ 255·n·n
        // stay in Long for any image up to ~190M pixels
        if (cellSum(c) * nPix > totalSum * cellN(c)) {
          if (c < 32) lo |= 1L << c else hi |= 1L << (c - 32)
        }
        c += 1
      }
      AHash(id, w, h, hi, lo)
    }

  // -------------------------------------------------------------- audio

  // Audio fixture arithmetic — like the image fixture, closed-form in
  // the id so the DuckDB oracle re-derives every decoded feature by
  // generating the same samples (no closed-form needed: the oracle
  // brute-forces the sample stream with generate_series).
  private[graft] def nSamplesOf(id: Long): Int = (1000 + id % 500).toInt
  private[graft] def sampleRateOf(id: Long): Int = (8000 + (id % 4) * 4000).toInt
  private[graft] def sampleAt(id: Long, i: Long): Int =
    (((i * 7919 + id * 104729) % 65536) - 32768).toInt

  /** Real 16-bit mono PCM WAV bytes via the JDK's `javax.sound.sampled`
    * writer — `AudioSystem.write(..., WAVE, ...)` builds the RIFF
    * container, so the decode side exercises a genuine WAV parse.
    */
  private def encodeWav(id: Long): Array[Byte] = {
    val n = nSamplesOf(id)
    val pcm = new Array[Byte](n * 2) // 16-bit little-endian mono
    var i = 0
    while (i < n) {
      val s = sampleAt(id, i.toLong)
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRateOf(id).toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** (id, content): REAL WAV bytes per id, encoded distributed (same
    * repartition-before-codec discipline as [[syntheticImages]]).
    */
  def syntheticAudio(df: DataFrame, idCol: String, batchSize: Int = 64)
                    (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions(_.grouped(batchSize).flatMap(_.map(id => (id, encodeWav(id)))))
      .toDF("id", "content")
  }

  /** Decoded audio features: exact integer aggregates over the PCM
    * stream (order-independent, engine-portable). Unreadable payloads
    * drop, like the image paths.
    */
  case class AudioFeatures(id: Long, sample_rate: Int, channels: Int,
                           n_samples: Long, peak_abs: Long, sum_samples: Long,
                           sum_abs: Long)

  private def decodeWav(id: Long, bytes: Array[Byte]): Option[AudioFeatures] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        // mono 16-bit only: multi-channel aggregates over the interleaved
        // stream would silently mix channels (peak/sum would be
        // per-frame-ambiguous), so reject like the bit-depth check — a
        // skipped row is visible, a wrong aggregate is not
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
        else {
          val ch = fmt.getChannels
          val le = !fmt.isBigEndian
          val buf = ais.readAllBytes()
          val n = buf.length / 2
          var (peak, sum, sumAbs) = (0L, 0L, 0L)
          var i = 0
          while (i < n) {
            val (b0, b1) = (buf(2 * i) & 0xFF, buf(2 * i + 1) & 0xFF)
            val s = (if (le) (b1 << 8) | b0 else (b0 << 8) | b1).toShort.toLong
            peak = math.max(peak, math.abs(s)); sum += s; sumAbs += math.abs(s)
            i += 1
          }
          Some(AudioFeatures(id, fmt.getSampleRate.toInt, ch,
            n.toLong / ch, peak, sum, sumAbs))
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Batched full-stream WAV decode over a binary column. */
  def extractAudioFeatures(df: DataFrame, idCol: String = "id",
                           contentCol: String = "content", batchSize: Int = 64)
                          (implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap {
        case (id, bytes) => decodeWav(id, bytes)
      }))
  }

  /** One active-energy segment: a maximal run of consecutive
    * above-mean-energy windows (window = `winSamples` samples, last
    * window may be partial). `seg_start`/`seg_end` are inclusive window
    * indices; `energy` is the exact Σ s² over the run.
    */
  case class AudioSegment(id: Long, seg_start: Long, seg_end: Long,
                          n_win: Long, energy: Long)

  /** Energy-threshold activity segmentation (the VAD shape: windowed
    * energy vs a per-file threshold, here the file's own mean window
    * energy, compared in exact cross-multiplied integers —
    * `e_w · n_windows > Σe`). Decode, window energies, threshold and
    * the gaps-and-islands run detection all happen INSIDE the batched
    * per-file decode — windows per file are bounded by the clip length,
    * so segments cost zero shuffle at any corpus size; only segment
    * rows leave the executor.
    */
  def extractAudioSegments(df: DataFrame, idCol: String = "id",
                           contentCol: String = "content",
                           winSamples: Int = 100, batchSize: Int = 64)
                          (implicit spark: SparkSession): Dataset[AudioSegment] = {
    import spark.implicits._
    require(winSamples >= 1, s"winSamples must be >= 1, got $winSamples")
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap {
        case (id, bytes) => segmentsOf(id, bytes, winSamples)
      }))
  }

  private def segmentsOf(id: Long, bytes: Array[Byte],
                         winSamples: Int): Seq[AudioSegment] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) Nil
        else {
          val le = !fmt.isBigEndian
          val buf = ais.readAllBytes()
          val n = buf.length / 2
          val nw = (n + winSamples - 1) / winSamples
          val e = new Array[Long](nw)
          var i = 0
          while (i < n) {
            val (b0, b1) = (buf(2 * i) & 0xFF, buf(2 * i + 1) & 0xFF)
            val s = (if (le) (b1 << 8) | b0 else (b0 << 8) | b1).toShort.toLong
            e(i / winSamples) += s * s
            i += 1
          }
          val tot = e.sum
          val segs = scala.collection.mutable.ArrayBuffer[AudioSegment]()
          var w = 0
          while (w < nw) {
            if (e(w) * nw > tot) {
              val start = w
              var energy = 0L
              while (w < nw && e(w) * nw > tot) { energy += e(w); w += 1 }
              segs += AudioSegment(id, start.toLong, (w - 1).toLong,
                (w - start).toLong, energy)
            } else w += 1
          }
          segs.toSeq
        }
      } finally ais.close()
    } catch { case _: Exception => Nil }

  // ------------------------------------------- video (multi-frame) path

  /** Per-SAMPLED-frame pixel statistics — the video analog of
    * [[ImageStats]]: frames are sampled by the [[frameSampleIndices]]
    * arithmetic (≤ maxFrames, evenly spaced) and only those are decoded.
    * Colors come from `getRGB` (palette-resolved), not raw raster
    * samples, so indexed containers (GIF) report true colors.
    */
  case class FrameStats(id: Long, frame_idx: Long, width: Int, height: Int,
                        sum_r: Long, sum_g: Long, sum_b: Long)

  private def decodeFrameStats(id: Long, bytes: Array[Byte],
                               maxFrames: Int): Seq[FrameStats] =
    withReader(bytes) { r =>
      val n = r.getNumImages(true)
      val step = math.max(1L, math.ceil(n.toDouble / maxFrames).toLong)
      (0L until n.toLong by step).map { f =>
        val img = r.read(f.toInt)
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
            x += 1
          }
          y += 1
        }
        FrameStats(id, f, w, h, sr, sg, sb)
      }
    }.getOrElse(Seq.empty)

  /** Batched sampled-frame decode over a binary column: decodes ONLY the
    * ≤ `maxFrames` sampled frames per media row — the 100 TB-relevant
    * property, since video decode cost is per-frame, not per-file.
    */
  def extractFrameStats(df: DataFrame, idCol: String = "id",
                        contentCol: String = "content", maxFrames: Int = 4,
                        batchSize: Int = 64)
                       (implicit spark: SparkSession): Dataset[FrameStats] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap {
        case (id, bytes) => decodeFrameStats(id, bytes, maxFrames)
      }))
  }

  // ------------------------------------------------- plan-level columns

  /** Resize plan: clamp the longer edge to `maxEdge`, preserving aspect —
    * pure metadata arithmetic (the pixel op belongs in the batched decode).
    */
  def resizedDims(width: Column, height: Column, maxEdge: Int): Column = {
    val scale = least(lit(1.0), lit(maxEdge) / greatest(width, height).cast("double"))
    struct(
      round(width * scale).cast("int").as("width"),
      round(height * scale).cast("int").as("height"))
  }

  /** Frame-sample plan for multi-frame media: indices of ≤ `maxFrames`
    * frames evenly spaced over [0, nFrames) — `sequence` keeps it an
    * array column, the sampled decode consumes it per batch.
    */
  def frameSampleIndices(nFrames: Column, maxFrames: Int): Column = {
    val step = greatest(lit(1L), ceil(nFrames / lit(maxFrames)).cast("long"))
    sequence(lit(0L), nFrames.cast("long") - 1, step)
  }
}
