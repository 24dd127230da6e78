package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaAsset

/** Real image decode path: [[Multimodal.decodeImageInfo]] against bytes
  * synthesized with the JDK's own encoders — actual PNG/JPEG/BMP
  * containers, not fixtures, so the test exercises a genuine
  * parse-the-header round trip. The gate queries stay on the stub path
  * (the synthetic corpus carries text bytes); this spec is what
  * certifies the plumbing would carry real media. */
class MultimodalSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def imageBytes(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // deterministic non-constant content so encoders can't degenerate
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out),
      s"JDK has no $format writer")
    out.toByteArray
  }

  test("decodeImageInfo reads true dimensions and format from real PNG/JPEG/BMP bytes") {
    val cases = Seq(("png", 17, 43), ("jpeg", 64, 32), ("bmp", 5, 9))
    for ((fmt, w, h) <- cases) {
      val info = Multimodal.decodeImageInfo(imageBytes(w, h, fmt))
      assert(info.isDefined, s"$fmt undecodable")
      assert(info.get.width == w && info.get.height == h, s"$fmt: $info")
      assert(info.get.format.contains(fmt.stripSuffix("eg")), s"$fmt: $info")
    }
  }

  test("decodeImageInfo returns None for junk bytes, not an exception") {
    assert(Multimodal.decodeImageInfo("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImageInfo(Array.empty[Byte]).isEmpty)
  }

  /** Real WAV container bytes from the JDK's own writer — the audio
    * mirror of [[imageBytes]]. */
  private def wavBytes(sampleRateHz: Int, channels: Int,
      nFrames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRateHz.toFloat, 16, channels, true, false)
    val frameBytes = 2 * channels
    val pcm = Array.tabulate(nFrames * frameBytes)(i => (i * 37 % 251).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeAudioInfo reads true rate/channels/frames from real WAV bytes") {
    val cases = Seq((8000, 1, 320), (44100, 2, 1000))
    for ((rate, ch, frames) <- cases) {
      val info = Multimodal.decodeAudioInfo(wavBytes(rate, ch, frames))
      assert(info.isDefined, s"wav $rate/$ch undecodable")
      assert(info.get.sampleRateHz == rate && info.get.channels == ch &&
        info.get.sampleBits == 16 && info.get.nFrames == frames.toLong &&
        info.get.format == "wave", s"wav: $info")
    }
    // junk bytes: None, not an exception (stub fallback handles it)
    assert(Multimodal.decodeAudioInfo("not audio".getBytes).isEmpty)
    assert(Multimodal.decodeAudioInfo(Array.empty[Byte]).isEmpty)
  }

  test("extractMeta(realAudioDecode) decodes real WAV assets distributed, stubs the rest") {
    val assets = Seq(
      MediaAsset(1L, "audio", wavBytes(16000, 1, 480)),
      MediaAsset(2L, "audio", wavBytes(48000, 2, 960)),
      MediaAsset(3L, "audio", "corrupt payload".getBytes), // stub fallback
      MediaAsset(4L, "image", wavBytes(8000, 1, 100))      // kind gates the decode
    ).toDS()
    val metas = Multimodal.extractMeta(assets, realAudioDecode = true)
      .collect().map(m => m.asset_id -> m).toMap
    // envelope packing: width = sample rate, height = channels,
    // n_frames = container frame count
    assert(metas(1L).width == 16000 && metas(1L).height == 1 &&
      metas(1L).n_frames == 480)
    assert(metas(2L).width == 48000 && metas(2L).height == 2 &&
      metas(2L).n_frames == 960)
    val stub3 = Multimodal.decodeStub(MediaAsset(3L, "audio", "corrupt payload".getBytes))
    assert(metas(3L) == stub3)
    // non-audio kinds never enter the audio decoder, even with real bytes
    val raw4 = assets.filter(_.asset_id == 4L).head()
    assert(metas(4L) == Multimodal.decodeStub(raw4))
  }

  test("extractMeta(realImageDecode) decodes real image assets distributed, stubs the rest") {
    val assets = Seq(
      MediaAsset(1L, "image", imageBytes(120, 80, "png")),
      MediaAsset(2L, "image", imageBytes(30, 60, "jpeg")),
      MediaAsset(3L, "image", "corrupt payload".getBytes), // falls back to stub
      MediaAsset(4L, "audio", imageBytes(10, 10, "png"))   // kind gates the decode
    ).toDS()
    val metas = Multimodal.extractMeta(assets, realImageDecode = true)
      .collect().map(m => m.asset_id -> m).toMap
    assert(metas(1L).width == 120 && metas(1L).height == 80 && metas(1L).n_frames == 1)
    assert(metas(2L).width == 30 && metas(2L).height == 60)
    // stub fallback: deterministic fake dims from the payload length
    val stub3 = Multimodal.decodeStub(MediaAsset(3L, "image", "corrupt payload".getBytes))
    assert(metas(3L) == stub3)
    // non-image kinds never enter the image decoder, even with real bytes
    val raw4 = assets.filter(_.asset_id == 4L).head()
    assert(metas(4L) == Multimodal.decodeStub(raw4))
  }

  test("default extractMeta is unchanged (stub path) — the gate contract") {
    val a = Seq(MediaAsset(9L, "image", imageBytes(40, 20, "png"))).toDS()
    val meta = Multimodal.extractMeta(a).collect().head
    assert(meta == Multimodal.decodeStub(a.head()))
  }
}
