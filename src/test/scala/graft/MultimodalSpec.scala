package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, max, size, split}

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

  test("dhash64: near-identical real images land close, different images far, resize-invariant") {
    // structured content (smooth gradient + a block) so the 9×8 grid
    // carries signal; pure noise would make dHash bits coin flips
    def structured(w: Int, h: Int, tweak: Boolean): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val base = (255 * x / w) << 16 | (255 * y / h) << 8 |
          (if (x > w / 2 && y > h / 2) 200 else 40)
        img.setRGB(x, y, base)
      }
      if (tweak) // a small overlay: a re-encode/watermark-sized change
        for (x <- 0 until math.min(6, w); y <- 0 until math.min(6, h))
          img.setRGB(x, y, 0xffffff)
      val out = new ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out))
      out.toByteArray
    }
    val base = Multimodal.dhash64(structured(96, 64, tweak = false)).get
    val tweaked = Multimodal.dhash64(structured(96, 64, tweak = true)).get
    val resized = Multimodal.dhash64(structured(192, 128, tweak = false)).get
    val other = Multimodal.dhash64(imageBytes(96, 64, "png")).get
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(base, tweaked) <= 6, s"tweak moved ${ham(base, tweaked)} bits")
    assert(ham(base, resized) <= 6, s"resize moved ${ham(base, resized)} bits")
    assert(ham(base, other) > 12, s"unrelated image only ${ham(base, other)} bits away")
    assert(Multimodal.dhash64("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("mm_phash gate: every planted re-encode recovered, pair set matches brute force") {
    val sf001 = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf001)
    val pb = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val pairs = graft.queries.LlmOps.mmPhash(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // recovery: every planted (orig, orig+pb) pair present within radius
    val plantedOrigs = docs
      .filter(col("doc_id") % 6 === 0 &&
        size(split(col("text"), " ")) >= 37)
      .collect().map(_.getLong(0))
    assert(plantedOrigs.nonEmpty, "fixture lost its plantable images")
    plantedOrigs.foreach { id =>
      val h = pairs.get((id, id + pb))
      assert(h.exists(_ <= 6), s"planted re-encode of $id not recovered ($h)")
    }
    // the perturbation must be visible SOMEWHERE (a single plant can
    // land at hamming 0 when its changed cell keeps both neighbor
    // orderings — each comparison is a hash-order coin flip)
    assert(plantedOrigs.exists(id => pairs.get((id, id + pb)).exists(_ >= 1)),
      "every plant reads as an exact dup — the perturbation stopped perturbing")
    // the banded detector is exact at radius 6 (pigeonhole): pair count
    // equals the number of planted recoveries plus natural collisions,
    // and every reported hamming is within the radius
    pairs.values.foreach(h => assert(h >= 0 && h <= 6))
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

  // ---- video: hand-assembled MP4/ISO-BMFF boxes (the JDK ships no MP4
  // muxer, so unlike the image/audio cases the container is synthesized
  // field by field — which also makes the expected offsets explicit) ----

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
  private def zeros(n: Int): Array[Byte] = new Array[Byte](n)
  private def bmffBox(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val body = parts.flatten.toArray
    be32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
  }
  // spec layouts: ISO/IEC 14496-12 §8.2.2 (mvhd), §8.3.2 (tkhd), §8.6.1.2 (stts)
  private def mvhdV0(timescale: Long, duration: Long): Array[Byte] =
    bmffBox("mvhd", zeros(4), zeros(8), be32(timescale), be32(duration), zeros(80))
  private def mvhdV1(timescale: Long, duration: Long): Array[Byte] =
    bmffBox("mvhd", Array(1.toByte), zeros(3), zeros(16), be32(timescale),
      be64(duration), zeros(80))
  private def tkhdV0(w: Int, h: Int): Array[Byte] =
    bmffBox("tkhd", zeros(4), zeros(8), be32(1), zeros(4), be32(0), zeros(8),
      zeros(8), zeros(36), be32(w.toLong << 16), be32(h.toLong << 16))
  private def tkhdV1(w: Int, h: Int): Array[Byte] =
    bmffBox("tkhd", Array(1.toByte), zeros(3), zeros(16), be32(1), zeros(4),
      be64(0), zeros(8), zeros(8), zeros(36),
      be32(w.toLong << 16), be32(h.toLong << 16))
  private def stts(entries: (Long, Long)*): Array[Byte] =
    bmffBox("stts", zeros(4), be32(entries.size.toLong),
      entries.toArray.flatMap { case (n, d) => be32(n) ++ be32(d) })
  private def trak(tkhd: Array[Byte], sttsBox: Array[Byte]): Array[Byte] =
    bmffBox("trak", tkhd,
      bmffBox("mdia", bmffBox("minf", bmffBox("stbl", sttsBox))))
  private def ftyp(brand: String): Array[Byte] =
    bmffBox("ftyp", brand.getBytes("US-ASCII"), be32(0), "mp41".getBytes("US-ASCII"))

  test("decodeVideoInfo reads brand/duration/dimensions/frames from v0 MP4 boxes") {
    val mp4 = ftyp("isom") ++ bmffBox("moov",
      mvhdV0(timescale = 1000, duration = 2500),
      trak(tkhdV0(640, 360), stts(30L -> 100L, 45L -> 200L)))
    val info = Multimodal.decodeVideoInfo(mp4)
    assert(info.contains(Multimodal.VideoInfo(640, 360, 2500, 75, "isom")), s"$info")
  }

  test("decodeVideoInfo handles version-1 mvhd/tkhd offsets and 64-bit duration") {
    val mp4 = ftyp("mp42") ++ bmffBox("moov",
      mvhdV1(timescale = 90000, duration = 450000), // 5 s in a 90 kHz timescale
      trak(tkhdV1(1920, 1080), stts(24L -> 3750L)))
    val info = Multimodal.decodeVideoInfo(mp4)
    assert(info.contains(Multimodal.VideoInfo(1920, 1080, 5000, 24, "mp42")), s"$info")
  }

  test("decodeVideoInfo credits frames to the visual trak, not a preceding audio trak") {
    // audio trak first (tkhd width 0, its own stts with 999 samples),
    // video trak second — frame count must come from the video trak
    val mp4 = ftyp("isom") ++ bmffBox("moov",
      mvhdV0(1000, 8000),
      trak(tkhdV0(0, 0), stts(999L -> 1L)),
      trak(tkhdV0(320, 240), stts(12L -> 512L)))
    val info = Multimodal.decodeVideoInfo(mp4)
    assert(info.contains(Multimodal.VideoInfo(320, 240, 8000, 12, "isom")), s"$info")
  }

  test("decodeVideoInfo returns None for junk/truncated/audio-only payloads") {
    assert(Multimodal.decodeVideoInfo("not a video".getBytes).isEmpty)
    assert(Multimodal.decodeVideoInfo(Array.empty[Byte]).isEmpty)
    // well-formed ftyp but no moov
    assert(Multimodal.decodeVideoInfo(ftyp("isom")).isEmpty)
    // moov with an audio-only trak (no visual dimensions)
    val audioOnly = ftyp("isom") ++ bmffBox("moov",
      mvhdV0(1000, 1000), trak(tkhdV0(0, 0), stts(100L -> 1L)))
    assert(Multimodal.decodeVideoInfo(audioOnly).isEmpty)
    // truncated mid-box: the declared moov size runs past the payload
    val whole = ftyp("isom") ++ bmffBox("moov",
      mvhdV0(1000, 2500), trak(tkhdV0(64, 48), stts(5L -> 1L)))
    assert(Multimodal.decodeVideoInfo(whole.dropRight(20)).isEmpty)
  }

  test("extractMeta(realVideoDecode) decodes real MP4 assets distributed, stubs the rest") {
    val mp4 = ftyp("isom") ++ bmffBox("moov",
      mvhdV0(1000, 4000), trak(tkhdV0(854, 480), stts(120L -> 33L)))
    val assets = Seq(
      MediaAsset(1L, "video", mp4),
      MediaAsset(2L, "video", "corrupt payload".getBytes), // stub fallback
      MediaAsset(3L, "image", mp4)                         // kind gates the decode
    ).toDS()
    val metas = Multimodal.extractMeta(assets, realVideoDecode = true)
      .collect().map(m => m.asset_id -> m).toMap
    assert(metas(1L).width == 854 && metas(1L).height == 480 &&
      metas(1L).n_frames == 120 && metas(1L).n_bytes == mp4.length.toLong)
    val stub2 = Multimodal.decodeStub(MediaAsset(2L, "video", "corrupt payload".getBytes))
    assert(metas(2L) == stub2)
    val raw3 = assets.filter(_.asset_id == 3L).head()
    assert(metas(3L) == Multimodal.decodeStub(raw3))
  }

  test("decodeAudioInfo rejects envelopes with NOT_SPECIFIED fields") {
    // an AIFF-C/AU stream of unknown length reports frameLength = -1;
    // simulate the honest JDK behavior with an AU header whose data size
    // field is 0xffffffff (unknown) — if the JDK still reports concrete
    // fields for this payload the guard is simply not exercised here,
    // so only assert that no -1 ever escapes into a Some
    val au = Array[Byte](0x2e, 0x73, 0x6e, 0x64) ++ // ".snd"
      be32(24) ++ be32(0xffffffffL) ++ be32(3) ++ be32(8000) ++ be32(1) ++
      Array.fill(64)(0x11.toByte)
    Multimodal.decodeAudioInfo(au).foreach { i =>
      assert(i.nFrames >= 0 && i.sampleRateHz > 0 && i.channels > 0 &&
        i.sampleBits > 0, s"NOT_SPECIFIED leaked into $i")
    }
  }

  test("default extractMeta is unchanged (stub path) — the gate contract") {
    val a = Seq(MediaAsset(9L, "image", imageBytes(40, 20, "png"))).toDS()
    val meta = Multimodal.extractMeta(a).collect().head
    assert(meta == Multimodal.decodeStub(a.head()))
  }

  /** Real WAV bytes from explicit 16-bit samples — controlled content
    * for the fingerprint invariance tests (unlike [[wavBytes]]'s
    * arbitrary byte fill). */
  private def wavFromSamples(samples: Array[Short],
      rateHz: Int = 16000): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      rateHz.toFloat, 16, 1, true, false) // signed little-endian mono
    val pcm = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audioEnergyFp: volume-scale exact-invariant, local noise near, unrelated far") {
    // structured signal: window-scale amplitude staircase + fine
    // texture, so the 65-window energy contour carries real signal
    def sig(i: Int): Short =
      (((i / 100) % 60 - 30) * 300 + (i % 11) * 13).toShort
    val n = 6500 // 100 samples per window
    val base = Array.tabulate(n)(sig)
    val louder = base.map(s => (s * 2).toShort) // |base| ≤ 9130, no clip
    val noisy = base.clone()
    for (i <- 900 until 960) // one window's worth of localized noise
      noisy(i) = (noisy(i) + 700).toShort
    val other = Array.tabulate(n)(i =>
      (((i * 2654435761L >>> 16) % 8000) - 4000).toShort)
    val fpBase = Multimodal.audioEnergyFp(wavFromSamples(base)).get
    val fpLoud = Multimodal.audioEnergyFp(wavFromSamples(louder)).get
    val fpNoisy = Multimodal.audioEnergyFp(wavFromSamples(noisy)).get
    val fpOther = Multimodal.audioEnergyFp(wavFromSamples(other)).get
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // uniform gain scales every window energy by exactly 4 — the
    // contour is bit-identical, not merely close
    assert(fpLoud == fpBase, s"volume scale moved ${ham(fpBase, fpLoud)} bits")
    assert(ham(fpBase, fpNoisy) <= 4,
      s"localized noise moved ${ham(fpBase, fpNoisy)} bits")
    assert(ham(fpBase, fpOther) > 12,
      s"unrelated clip only ${ham(fpBase, fpOther)} bits away")
    // deterministic across re-encodes of the same samples
    assert(Multimodal.audioEnergyFp(wavFromSamples(base)).contains(fpBase))
  }

  test("audioEnergyFp: decodable-envelope edges — short clips, junk, 8-bit, stereo") {
    // clips shorter than the window count have no stable contour
    assert(Multimodal.audioEnergyFp(
      wavFromSamples(Array.tabulate(64)(i => (i * 50).toShort))).isEmpty)
    assert(Multimodal.audioEnergyFp(
      wavFromSamples(Array.tabulate(65)(i => (i * 50).toShort))).isDefined)
    assert(Multimodal.audioEnergyFp("not audio".getBytes).isEmpty)
    assert(Multimodal.audioEnergyFp(Array.empty[Byte]).isEmpty)
    // 8-bit unsigned mono WAV decodes through the bps==1 branch
    val fmt8 = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 8, 1, 1, 8000f, false)
    val pcm8 = Array.tabulate(800)(i => ((i * 7) % 256).toByte)
    val ais8 = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm8), fmt8, 800L)
    val out8 = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais8,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out8)
    assert(Multimodal.audioEnergyFp(out8.toByteArray).isDefined)
    // stereo folds channels into the window energy (interleaved frames)
    val fmtSt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val pcmSt = Array.tabulate(4000 * 4)(i => ((i * 37) % 251).toByte)
    val aisSt = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcmSt), fmtSt, 4000L)
    val outSt = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(aisSt,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, outSt)
    assert(Multimodal.audioEnergyFp(outSt.toByteArray).isDefined)
  }

  /** stsz with per-sample sizes (sample_size field = 0). */
  private def stsz(sizes: Seq[Long]): Array[Byte] =
    bmffBox("stsz", zeros(4), be32(0), be32(sizes.size.toLong),
      sizes.toArray.flatMap(be32))
  private def trakStbl(tkhd: Array[Byte], stblBoxes: Array[Byte]*): Array[Byte] =
    bmffBox("trak", tkhd,
      bmffBox("mdia", bmffBox("minf",
        bmffBox("stbl", stblBoxes.flatten.toArray))))

  test("videoSizeContourFp: bitrate-scale exact-invariant, splice near, unrelated far") {
    // structured frame-size trace: GOP-scale staircase + fine texture,
    // the shape a real I/P/B stream has
    def sz(i: Int): Long = (((i / 100) % 60 - 30) * 300 + (i % 11) * 13 + 20000).toLong
    val n = 6500
    val base = Seq.tabulate(n)(sz)
    val scaled = base.map(_ * 2)    // re-encode at 2x bitrate
    val spliced = base.zipWithIndex.map { case (s, i) =>
      if (i >= 900 && i < 960) s + 7000L else s } // localized splice
    val other = Seq.tabulate(n)(i => ((i * 2654435761L >>> 16) % 8000) + 20000)
    def mp4(sizes: Seq[Long]) = ftyp("isom") ++ bmffBox("moov",
      mvhdV0(1000, 2500), trakStbl(tkhdV0(640, 360),
        stts(sizes.size.toLong -> 33L), stsz(sizes)))
    val fpBase = Multimodal.videoSizeContourFp(mp4(base)).get
    val fpScaled = Multimodal.videoSizeContourFp(mp4(scaled)).get
    val fpSpliced = Multimodal.videoSizeContourFp(mp4(spliced)).get
    val fpOther = Multimodal.videoSizeContourFp(mp4(other)).get
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // uniform bitrate scaling multiplies every window sum by exactly 2
    assert(fpScaled == fpBase, s"bitrate scale moved ${ham(fpBase, fpScaled)} bits")
    assert(ham(fpBase, fpSpliced) <= 4,
      s"splice moved ${ham(fpBase, fpSpliced)} bits")
    assert(ham(fpBase, fpOther) > 12,
      s"unrelated stream only ${ham(fpBase, fpOther)} bits away")
    assert(Multimodal.videoSizeContourFp(mp4(base)).contains(fpBase))
  }

  test("videoSizeContourFp: envelope edges — short, uniform, audio-trak stsz, junk") {
    def mp4(sizes: Seq[Long]) = ftyp("isom") ++ bmffBox("moov",
      mvhdV0(1000, 2500), trakStbl(tkhdV0(640, 360),
        stts(sizes.size.toLong -> 33L), stsz(sizes)))
    // fewer frames than windows: no stable contour
    assert(Multimodal.videoSizeContourFp(mp4(Seq.tabulate(64)(i => i + 100L))).isEmpty)
    assert(Multimodal.videoSizeContourFp(mp4(Seq.tabulate(65)(i => i + 100L))).isDefined)
    // uniform-size stsz (sample_size != 0, no per-sample table)
    val uniform = ftyp("isom") ++ bmffBox("moov",
      mvhdV0(1000, 2500), trakStbl(tkhdV0(640, 360), stts(100L -> 33L),
        bmffBox("stsz", zeros(4), be32(512), be32(100))))
    assert(Multimodal.videoSizeContourFp(uniform).isEmpty)
    // an audio trak's stsz (tkhd width 0) must not be credited
    val audioOnly = ftyp("isom") ++ bmffBox("moov",
      mvhdV0(1000, 2500), trakStbl(tkhdV0(0, 0), stts(100L -> 33L),
        stsz(Seq.tabulate(100)(i => i + 50L))))
    assert(Multimodal.videoSizeContourFp(audioOnly).isEmpty)
    // and with BOTH traks present, only the visual trak's stsz counts:
    // the audio trak's 100 monotone sizes would give a different contour
    val both = ftyp("isom") ++ bmffBox("moov", mvhdV0(1000, 2500),
      trakStbl(tkhdV0(0, 0), stsz(Seq.tabulate(100)(i => i + 50L))),
      trakStbl(tkhdV0(640, 360), stsz(Seq.tabulate(100)(i => 50000L - i * 7))))
    val fpBoth = Multimodal.videoSizeContourFp(both)
    val fpVisualOnly = Multimodal.videoSizeContourFp(ftyp("isom") ++ bmffBox("moov",
      mvhdV0(1000, 2500),
      trakStbl(tkhdV0(640, 360), stsz(Seq.tabulate(100)(i => 50000L - i * 7)))))
    assert(fpBoth.isDefined && fpBoth == fpVisualOnly)
    // a FIRST visual trak with only a uniform stsz must not lock out a
    // SECOND visual trak that carries the per-sample table (round-13
    // advice: the old width==0 gate returned None here)
    val secondVisual = ftyp("isom") ++ bmffBox("moov", mvhdV0(1000, 2500),
      trakStbl(tkhdV0(320, 180), stts(100L -> 33L),
        bmffBox("stsz", zeros(4), be32(512), be32(100))),
      trakStbl(tkhdV0(640, 360), stsz(Seq.tabulate(100)(i => 50000L - i * 7))))
    assert(Multimodal.videoSizeContourFp(secondVisual) == fpVisualOnly)
    assert(Multimodal.videoSizeContourFp("not video".getBytes).isEmpty)
    assert(Multimodal.videoSizeContourFp(Array.empty[Byte]).isEmpty)
  }

  test("mm_video_fp gate: bitrate plants at hamming 0, splice plants within radius") {
    val sf001 = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf001)
    val pb = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val pairs = graft.queries.LlmOps.mmVideoFp(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val vids = docs.filter(col("doc_id") % 3 === 2 &&
        size(split(col("text"), " ")) >= 65)
      .collect().map(_.getLong(0))
    val brOrigs = vids.filter(_ % 10 == 3)
    val spOrigs = vids.filter(_ % 10 == 9)
    assert(brOrigs.nonEmpty && spOrigs.nonEmpty,
      "fixture lost its plantable video")
    // gain 2 scales every window sum by exactly 2: the re-encoded
    // 2x-bitrate upload is an EXACT fp dup
    brOrigs.foreach { id =>
      assert(pairs.get((id, id + pb)).contains(0),
        s"bitrate plant of $id not an exact fp dup (${pairs.get((id, id + pb))})")
    }
    // one moved frame size changes one window's sum: <= 2 contour bits
    spOrigs.foreach { id =>
      val h = pairs.get((id, id + 2 * pb))
      assert(h.exists(_ <= 2), s"splice plant of $id not recovered ($h)")
    }
    assert(spOrigs.exists(id => pairs.get((id, id + 2 * pb)).exists(_ >= 1)),
      "every splice plant reads as an exact dup — the perturbation stopped perturbing")
    pairs.values.foreach(h => assert(h >= 0 && h <= 6))
  }

  test("mm_audio_fp gate: volume plants at hamming 0, edit plants within radius") {
    val sf001 = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf001)
    val pb = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val pairs = graft.queries.LlmOps.mmAudioFp(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val audible = docs.filter(col("doc_id") % 3 === 1 &&
        size(split(col("text"), " ")) >= 65)
      .collect().map(_.getLong(0))
    val volOrigs = audible.filter(_ % 10 == 1)
    val editOrigs = audible.filter(_ % 10 == 7)
    assert(volOrigs.nonEmpty && editOrigs.nonEmpty,
      "fixture lost its plantable audio")
    // gain 2 scales every window energy by exactly 4: the re-encoded
    // louder upload is an EXACT fp dup
    volOrigs.foreach { id =>
      assert(pairs.get((id, id + pb)).contains(0),
        s"volume plant of $id not an exact fp dup (${pairs.get((id, id + pb))})")
    }
    // one moved sample changes one window's energy: ≤ 2 contour bits
    editOrigs.foreach { id =>
      val h = pairs.get((id, id + 2 * pb))
      assert(h.exists(_ <= 2), s"edit plant of $id not recovered ($h)")
    }
    // the edit must be visible somewhere (not every plant may flip a
    // bit — both neighbor orderings can survive one window's move)
    assert(editOrigs.exists(id => pairs.get((id, id + 2 * pb)).exists(_ >= 1)),
      "every edit plant reads as an exact dup — the perturbation stopped perturbing")
    pairs.values.foreach(h => assert(h >= 0 && h <= 6))
  }

  test("mm_dup_union capstone: groups anchored by naturals, per-detector evidence accounted") {
    val sf001 = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf001)
    val pb = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val rows = graft.queries.LlmOps.mmDupUnion(spark, sf001).collect()
    assert(rows.nonEmpty)
    // every component has >= 2 members and enough edges to be connected
    rows.foreach { r =>
      val (n, ne, np, na, nv, ns) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7))
      assert(n >= 2, s"singleton component $r")
      assert(ne + np + na + nv + ns >= n - 1, s"under-connected component $r")
    }
    // every plant pairs with its original (exact at hamming 0, edits
    // within the banding radius), so every group is anchored by a
    // NATURAL asset — no keeper may come from the planted id spaces
    rows.foreach(r => assert(r.getLong(0) < pb, s"plant-keeper component $r"))
    // per-detector floors: each class-A plant yields >= 1 exact edge;
    // each contour-covered plant (image >= 1 tok / audio >= 65 tok)
    // yields >= 1 pair for its perceptual detector
    val d = docs.select(col("doc_id"),
        size(split(col("text"), " ")).as("ntok")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nExactPlants = d.keys.count(_ % 4 == 1)
    val nPhashFloor = d.count { case (id, nt) =>
      id % 3 == 0 && ((id % 4 == 1 && nt >= 1) || (id % 6 == 0 && nt >= 37)) }
    val nAudioFloor = d.count { case (id, nt) =>
      id % 3 == 1 && nt >= 65 && (id % 4 == 1 || id % 10 == 7) }
    val nVideoFloor = d.count { case (id, nt) =>
      id % 3 == 2 && nt >= 65 && (id % 4 == 1 || id % 10 == 9) }
    assert(nExactPlants > 0 && nPhashFloor > 0 && nAudioFloor > 0 &&
      nVideoFloor > 0, "fixture lost its plantable assets")
    assert(rows.map(_.getLong(3)).sum >= nExactPlants)
    assert(rows.map(_.getLong(4)).sum >= nPhashFloor)
    assert(rows.map(_.getLong(5)).sum >= nAudioFloor)
    assert(rows.map(_.getLong(6)).sum >= nVideoFloor)
    // fifth leg: every class-C semantic re-render (asset % 7 == 2, a
    // payload sharing NO tokens with its base) must reach its base's
    // component, and it can ONLY do so via the semantic detector —
    // each contributes at least one semantic edge
    val nSemPlants = d.keys.count(_ % 7 == 2)
    assert(nSemPlants > 0, "fixture lost its semantic plants")
    assert(rows.map(_.getLong(7)).sum >= nSemPlants)
    // every class-C twin is a MEMBER of some component (it shares no
    // tokens with anything, so only the semantic leg can place it):
    // total membership must cover all plants of every class
    val totalMembers = rows.map(_.getLong(1)).sum
    val minPlanted = nExactPlants + nSemPlants
    assert(totalMembers >= minPlanted + rows.length,
      s"components too small to hold every planted twin: $totalMembers")
  }

  test("mm_semdedup: planted re-renders and re-encodes cluster to their base, naturals stay") {
    val sf001 = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, sf001)
    val pb = emb.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val rows = graft.queries.LlmOps.mmSemDedup(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val ids = emb.select("vec_id").collect().map(_.getLong(0))
    val expectExact = ids.filter(_ % 7 == 2).map(b => (b + 3 * pb, b)).toMap
    val expectNear = ids.filter(_ % 9 == 4).map(b => (b + 4 * pb, b)).toMap
    val got = rows.map(_._1).toSet
    // only planted twins can be dups (no natural pair reaches 0.95)
    assert(got.subsetOf(expectExact.keySet ++ expectNear.keySet))
    // exact re-renders share their base's embedding bit-for-bit, so
    // they land in the base's cell BY CONSTRUCTION: recall 1 required
    assert(expectExact.keySet.subsetOf(got), "an exact re-render escaped")
    // near re-encodes drift by one component; a twin whose base sits
    // on a cell boundary can argmax into a neighboring cell — the
    // SemDeDup recall tradeoff. Require the overwhelming majority.
    val nearFound = expectNear.keySet.count(got)
    assert(nearFound * 10 >= expectNear.size * 9,
      s"near-twin recall collapsed: $nearFound/${expectNear.size}")
    // every recovered twin's keeper is its own base
    rows.foreach { case (a, kind, keep) =>
      val base = expectExact.getOrElse(a, expectNear(a))
      assert(keep == base, s"twin $a kept by $keep, expected base $base")
      val wantKind = (base % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video" }
      assert(kind == wantKind, s"twin $a kind $kind != base kind $wantKind")
    }
  }
}
