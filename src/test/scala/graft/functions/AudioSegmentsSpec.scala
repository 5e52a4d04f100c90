package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** VAD segmentation: thresholds, run merging, partial windows. */
class AudioSegmentsSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sp: SparkSession = spark

  private def wav(samples: Array[Int]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      pcm(2 * i) = (samples(i) & 0xFF).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def segs(id: Long, samples: Array[Int], win: Int = 4) =
    Multimodal.extractAudioSegments(
        Seq((id, wav(samples))).toDF("id", "content"), winSamples = win)
      .collect().map(s => (s.seg_start, s.seg_end, s.n_win, s.energy)).toSeq

  test("constant signal: every window AT the mean, strict > keeps silence") {
    assert(segs(1L, Array.fill(16)(100)) == Nil)
  }

  test("one loud window: a single exact-energy segment") {
    // windows of 4; window 2 (samples 8-11) loud
    val s = Array.fill(16)(10)
    (8 until 12).foreach(i => s(i) = 1000)
    assert(segs(2L, s) == Seq((2L, 2L, 1L, 4L * 1000L * 1000L)))
  }

  test("adjacent loud windows merge; separated loud windows stay apart") {
    val s = Array.fill(24)(0)
    (0 until 8).foreach(i => s(i) = 500)    // windows 0,1
    (16 until 20).foreach(i => s(i) = 500)  // window 4
    assert(segs(3L, s) == Seq(
      (0L, 1L, 2L, 8L * 500L * 500L), (4L, 4L, 1L, 4L * 500L * 500L)))
  }

  test("partial last window participates with its own energy") {
    // 10 samples, win=4 -> windows of 4,4,2; loud partial tail
    val s = Array.fill(10)(0)
    s(8) = 2000; s(9) = 2000
    assert(segs(4L, s) == Seq((2L, 2L, 1L, 2L * 2000L * 2000L)))
  }

  test("non-mono/8-bit payloads drop silently like the feature path") {
    val bad = Array[Byte](1, 2, 3, 4)
    val out = Multimodal.extractAudioSegments(
      Seq((9L, bad)).toDF("id", "content")).collect()
    assert(out.isEmpty)
  }
}
