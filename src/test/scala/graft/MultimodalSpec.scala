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
