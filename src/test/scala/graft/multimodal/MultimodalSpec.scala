package graft.multimodal

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def media() = df("path STRING, length BIGINT, content BINARY",
    Row("a.jpg", 5L, Array[Byte](1, 2, 3, 4, 5)),
    Row("b.jpg", 3L, Array[Byte](9, 8, 7)),
    Row("c.mp4", 8L, Array[Byte](1, 1, 2, 2, 3, 3, 4, 4)))

  test("withMetadata attaches the typed media_meta struct") {
    val out = Multimodal.withMetadata(media())
    val meta = out.schema("media_meta").dataType
    assert(meta == Multimodal.mediaMetaSchema)
    val r = out.filter(col("path") === "a.jpg")
      .select(col("media_meta.width"), col("media_meta.height"),
        col("media_meta.n_channels")).collect()(0)
    assert(r.getInt(0) >= 64 && r.getInt(1) >= 64 && r.getInt(2) == 3)
  }

  test("metadata is deterministic per payload") {
    val a = Multimodal.withMetadata(media()).select("media_meta.width")
      .collect().map(_.getInt(0))
    val b = Multimodal.withMetadata(media()).select("media_meta.width")
      .collect().map(_.getInt(0))
    assert(a.sameElements(b))
  }

  test("extractFeatures: fixed-dim float vector per payload") {
    val out = Multimodal.extractFeatures(media(), dim = 16)
    val vecs = out.select(col("media_embedding")).collect()
      .map(_.getSeq[Float](0))
    assert(vecs.forall(_.length == 16))
    assert(vecs(0) != vecs(1)) // different payloads -> different features
  }

  test("resize rewrites payload and refreshes metadata") {
    val out = Multimodal.resize(media(), 32, 32)
    assert(out.columns.contains("media_meta"))
    val lens = out.select(length(col("content"))).collect()
      .map(_.getInt(0))
    assert(lens.forall(_ >= 1))
  }

  test("sampleFrames explodes video into n frame rows with indices") {
    val vid = media().filter(col("path") === "c.mp4")
    val out = Multimodal.sampleFrames(vid, n = 4)
    assert(out.count() == 4)
    val idx = out.select(col("frame_index")).collect()
      .map(_.getLong(0)).sorted
    assert(idx.sameElements(Array(0L, 1L, 2L, 3L)))
    // frames partition the payload (stub semantics: stride slices)
    val frames = out.select(col("frame")).collect()
      .map(_.getAs[Array[Byte]](0))
    assert(frames.forall(_.nonEmpty))
  }

  // ---- ImageHeaders: REAL container parsing (no stub) ----

  private def parseOne(content: Array[Byte])
      : (Option[String], Option[Int], Option[Int]) = {
    val r = df("content BINARY", Row(content))
      .select(ImageHeaders.parse(col("content")).as("m"))
      .select(col("m.format"), col("m.width"), col("m.height"))
      .collect()(0)
    (Option(r.getString(0)),
      if (r.isNullAt(1)) None else Some(r.getInt(1)),
      if (r.isNullAt(2)) None else Some(r.getInt(2)))
  }

  private def synth(pngNotJpeg: Boolean, w: Int, h: Int, pad: Int = 0,
                    extraApp1: Boolean = false,
                    body: String = "payload"): Array[Byte] = {
    val c = if (pngNotJpeg)
      ImageHeaders.pngBytes(lit(w), lit(h), lit(body))
    else
      ImageHeaders.jpegBytes(lit(w), lit(h), lit(pad), lit(extraApp1),
        lit(body))
    df("x INT", Row(1)).select(c.as("c")).collect()(0).getAs[Array[Byte]](0)
  }

  test("ImageHeaders: PNG and JPEG round-trip their real dimensions " +
    "(IHDR fixed offsets; SOF behind 1 or 2 length-prefixed segments)") {
    assert(parseOne(synth(pngNotJpeg = true, 640, 480)) ==
      ((Some("png"), Some(640), Some(480))))
    assert(parseOne(synth(pngNotJpeg = true, 1, 65535)) ==
      ((Some("png"), Some(1), Some(65535))))
    for (pad <- Seq(0, 1, 63); extra <- Seq(false, true)) {
      assert(parseOne(synth(pngNotJpeg = false, 1920, 1080, pad, extra)) ==
        ((Some("jpeg"), Some(1920), Some(1080))),
        s"pad=$pad extraApp1=$extra")
    }
  }

  test("ImageHeaders: PNG magic verified byte-for-byte — a JPEG body " +
    "with PNG-like size is not misparsed, and vice versa") {
    val png = synth(pngNotJpeg = true, 100, 200)
    val jpg = synth(pngNotJpeg = false, 100, 200)
    assert(parseOne(png)._1.contains("png"))
    assert(parseOne(jpg)._1.contains("jpeg"))
  }

  test("ImageHeaders: truncated and corrupt headers parse to NULLs, " +
    "never garbage dimensions") {
    val png = synth(pngNotJpeg = true, 640, 480)
    val jpg = synth(pngNotJpeg = false, 640, 480, pad = 3)
    // truncated before the dimension fields
    assert(parseOne(png.take(10)) == ((None, None, None)))
    assert(parseOne(png.take(20)) == ((None, None, None)))
    assert(parseOne(jpg.take(6)) == ((None, None, None)))
    // JPEG truncated mid-walk (inside APP0, before SOF)
    assert(parseOne(jpg.take(12)) == ((None, None, None)))
    // corrupt magic / flipped chunk tag
    val badMagic = png.clone(); badMagic(0) = 0x42
    assert(parseOne(badMagic) == ((None, None, None)))
    val badIhdr = png.clone(); badIhdr(12) = 'X'.toByte
    assert(parseOne(badIhdr) == ((None, None, None)))
    // garbage that is neither container
    assert(parseOne("not an image at all".getBytes("UTF-8")) ==
      ((None, None, None)))
    assert(parseOne(Array.emptyByteArray) == ((None, None, None)))
    // a JPEG whose walk never reaches SOF inside MaxJpegSegments: chain
    // of empty APP1 segments (each FFE1 0002) deeper than the bound
    val deep = "FFD8" +
      ("FFE1" + "0002") * (ImageHeaders.MaxJpegSegments + 1) +
      "FFC0001108" + "0100" + "0100" + "03011100021101031101"
    val deepBytes = deep.sliding(2, 2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    assert(parseOne(deepBytes) == ((None, None, None)))
    // ...but the same chain within the bound parses fine
    val ok = "FFD8" +
      ("FFE1" + "0002") * (ImageHeaders.MaxJpegSegments - 1) +
      "FFC0001108" + "0100" + "0100" + "03011100021101031101"
    val okBytes = ok.sliding(2, 2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    assert(parseOne(okBytes) == ((Some("jpeg"), Some(256), Some(256))))
  }

  // ---- WavHeaders: REAL RIFF/WAVE container parsing (no stub) ----

  private def wavSynth(ch: Int, rate: Int, bits: Int, pad: Int = 0,
                       withList: Boolean = false,
                       body: String = "pcm-payload"): Array[Byte] = {
    val c = WavHeaders.wavBytes(lit(ch.toLong), lit(rate.toLong),
      lit(bits.toLong), lit(pad.toLong), lit(withList), lit(body))
    df("x INT", Row(1)).select(c.as("c")).collect()(0).getAs[Array[Byte]](0)
  }

  private def wavParse(content: Array[Byte])
      : Option[(Int, Long, Int, Long, Long)] = {
    val r = df("content BINARY", Row(content))
      .select(WavHeaders.parse(col("content")).as("m"))
      .select(col("m.format"), col("m.channels"), col("m.sample_rate"),
        col("m.bits"), col("m.data_bytes"), col("m.duration_ms"))
      .collect()(0)
    if (r.isNullAt(0)) None
    else Some((r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4),
      r.getLong(5)))
  }

  test("WavHeaders: canonical and LIST-chunked WAVs round-trip channels/" +
    "rate/bits/data size; duration is the floored PCM formula") {
    val body = "0123456789abcdef" // 16 bytes
    // 2ch 16-bit 8000 Hz -> byte rate 32000; 16 bytes -> 0 ms (floor)
    assert(wavParse(wavSynth(2, 8000, 16, body = body)) ==
      Some((2, 8000L, 16, 16L, 0L)))
    // 1ch 8-bit 1 Hz -> byte rate 1; 16 bytes -> 16000 ms
    assert(wavParse(wavSynth(1, 1, 8, body = body)) ==
      Some((1, 1L, 8, 16L, 16000L)))
    // the length-prefixed LIST chunk is hopped, not misparsed
    for (pad <- Seq(0, 2, 62))
      assert(wavParse(wavSynth(1, 44100, 16, pad, withList = true,
        body = body)) == Some((1, 44100L, 16, 16L, 0L)), s"pad=$pad")
  }

  test("WavHeaders: truncation, wrong magics, and out-of-range synth " +
    "inputs all yield NULL, never garbage") {
    val good = wavSynth(2, 16000, 16)
    assert(wavParse(good).isDefined)
    // truncated before the data chunk header completes
    assert(wavParse(good.take(40)) == None)
    assert(wavParse(good.take(8)) == None)
    assert(wavParse(Array.emptyByteArray) == None)
    // RIFF magic intact but WAVE form tag corrupted
    val badWave = good.clone(); badWave(8) = 'X'.toByte
    assert(wavParse(badWave) == None)
    // a PNG is not a WAV
    assert(wavParse(synth(pngNotJpeg = true, 10, 10)) == None)
    // synth guards: zero channels, non-byte bit depth, odd pad -> NULL
    val guards = df("x INT", Row(1)).select(
      WavHeaders.wavBytes(lit(0L), lit(8000L), lit(16L), lit(0L),
        lit(false), lit("b")).as("a"),
      WavHeaders.wavBytes(lit(1L), lit(8000L), lit(12L), lit(0L),
        lit(false), lit("b")).as("b"),
      WavHeaders.wavBytes(lit(1L), lit(8000L), lit(16L), lit(3L),
        lit(true), lit("b")).as("c")).collect()(0)
    assert(guards.isNullAt(0) && guards.isNullAt(1) && guards.isNullAt(2))
  }

  test("WavHeaders: a data chunk deeper than MaxChunks parses NULL; " +
    "within the bound it parses") {
    def hexBytes(h: String): Array[Byte] =
      h.sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray
    def junk(n: Int): String = ("4A554E4B" + "02000000" + "0000") * n
    val fmt = "666D7420" + "10000000" + "0100" + "0100" +
      "401F0000" + "401F0000" + "0100" + "0800"
    def whole(nJunk: Int): String = {
      val payload = fmt + junk(nJunk) + "64617461" + "04000000" + "AABBCCDD"
      "52494646" + f"${payload.length / 2 + 4}%02X000000" + "57415645" +
        payload
    }
    assert(wavParse(hexBytes(whole(WavHeaders.MaxChunks - 1))) == None)
    assert(wavParse(hexBytes(whole(WavHeaders.MaxChunks - 2))).isDefined)
  }
}
