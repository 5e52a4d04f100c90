package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus the decode / feature-extract / resize /
  * frame-sample plumbing a training-data pipeline needs.
  *
  * The Spark-side machinery here is REAL — schemas, batched
  * mapPartitions iteration (the JVM analog of mapInPandas: decode
  * batches, not rows, to amortize codec setup), partitioning, output
  * encoders. The codecs themselves are STUBBED with deterministic fakes
  * (image/audio libraries are unavailable in this container): every stub
  * is marked `STUB:` and isolated behind one function so a real codec
  * (javacv / ImageIO) drops in without touching the plumbing.
  *
  * Scale notes: media bytes dominate row size, so (1) never shuffle the
  * binary column — derive metadata/features first, then drop it; (2)
  * decode is CPU-bound → `repartition(n)` before the mapPartitions to
  * use all cores; (3) batch size bounds peak memory per task.
  */
object Multimodal {

  /** Typed metadata carried next to the binary payload. */
  case class MediaMeta(mediaType: String, sizeBytes: Long, width: Int, height: Int,
                       nFrames: Int)

  /** Extracted per-media features (the mapPartitions output contract). */
  case class MediaFeatures(id: Long, width: Int, height: Int, nFrames: Int,
                           features: Array[Float])

  /** Fake-media header layout: `GMED|<type>|<w>|<h>|<frames>|` followed by
    * payload bytes. Lets the decode path exercise real binary parsing.
    */
  private val Magic = "GMED"

  /** Attach a deterministic fake media payload to each row (test/demo
    * fixture). Payload derives from the id — stable across runs.
    */
  def withFakeMedia(df: DataFrame, idCol: String, mediaType: String = "image"): DataFrame = {
    val w = (pmod(xxhash64(col(idCol), lit(1)), lit(1920)) + lit(16)).cast("int")
    val h = (pmod(xxhash64(col(idCol), lit(2)), lit(1080)) + lit(16)).cast("int")
    val frames = if (mediaType == "video")
      (pmod(xxhash64(col(idCol), lit(3)), lit(300)) + lit(1)).cast("int") else lit(1)
    val payload = sha2(concat_ws("-", col(idCol), lit(mediaType)), 256)
    df.withColumn("content",
        concat_ws("|", lit(Magic), lit(mediaType), w, h, frames, payload).cast("binary"))
      .withColumn("media_meta", struct(
        lit(mediaType).as("mediaType"),
        length(col("content")).cast("long").as("sizeBytes"),
        w.as("width"), h.as("height"), frames.as("nFrames")))
  }

  /** STUB: header-parse "decode" of the binary column → metadata struct.
    * Real codecs replace the split with an image-header read; the binary
    * column handling (null-safe cast, malformed → null struct) is real.
    */
  def decodeMediaMeta(content: Column): Column = {
    val s = content.cast("string")
    val parts = split(s, "\\|")
    when(parts.getItem(0) === Magic, struct(
      parts.getItem(1).as("mediaType"),
      length(content).cast("long").as("sizeBytes"),
      parts.getItem(2).cast("int").as("width"),
      parts.getItem(3).cast("int").as("height"),
      parts.getItem(4).cast("int").as("nFrames")))
      .otherwise(lit(null))
  }

  /** Resize plan: clamp the longer edge to `maxEdge`, preserving aspect —
    * pure metadata arithmetic (the pixel op happens in the batched decode).
    */
  def resizedDims(width: Column, height: Column, maxEdge: Int): Column = {
    val scale = least(lit(1.0), lit(maxEdge) / greatest(width, height).cast("double"))
    struct(
      round(width * scale).cast("int").as("width"),
      round(height * scale).cast("int").as("height"))
  }

  /** Frame-sample plan for video: indices of ≤ `maxFrames` frames evenly
    * spaced over [0, nFrames) — `sequence` keeps it an array column, the
    * sampled decode consumes it per batch.
    */
  def frameSampleIndices(nFrames: Column, maxFrames: Int): Column = {
    val step = greatest(lit(1L), ceil(nFrames / lit(maxFrames)).cast("long"))
    sequence(lit(0L), nFrames.cast("long") - 1, step)
  }

  /** Batched feature extraction over the binary column — the heavy-decode
    * path. Iterates each partition in `batchSize` groups (amortizes codec
    * init per batch, bounds task memory); rows with unparseable payloads
    * are dropped, matching a lossy-decode contract.
    */
  def extractFeatures(df: DataFrame, idCol: String, batchSize: Int = 64)
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // real codec would init once per batch here
          batch.flatMap { case (id, bytes) => decodeOne(id, bytes) }
        }
      }
  }

  /** STUB: single-item decode kernel — parses the fake header and emits a
    * deterministic 8-dim feature vector derived from the payload bytes.
    * A real implementation decodes pixels and runs the feature net.
    */
  private def decodeOne(id: Long, bytes: Array[Byte]): Option[MediaFeatures] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val parts = s.split('|')
    if (parts.length < 6 || parts(0) != Magic) None
    else {
      val (w, h, f) = (parts(2).toInt, parts(3).toInt, parts(4).toInt)
      val seed = java.util.Arrays.hashCode(bytes)
      val feats = Array.tabulate(8)(i => ((seed * (i + 1)).toFloat / Int.MaxValue))
      Some(MediaFeatures(id, w, h, f, feats))
    }
  }
}
