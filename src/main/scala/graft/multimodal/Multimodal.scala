package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque BINARY columns with typed metadata
  * structs; decode / feature-extract / resize / frame-sample run as
  * partition-local batch transforms.
  *
  * The actual codecs (JPEG/PNG/audio) are NOT available in this
  * environment, so [[StubCodec]] is a clearly-marked deterministic fake —
  * the Spark-side contract (schema, batch shape, partition locality,
  * binary-file source) is real and tested, and swapping in a real codec
  * is a one-function change.
  */
object Multimodal {

  /** Typed metadata attached to each media payload. */
  final case class MediaMeta(media_type: String, format: String,
                             width: Int, height: Int, n_channels: Int,
                             duration_ms: Long)

  /** Struct type of [[MediaMeta]] as the typed udf emits it (primitive
    * fields non-nullable). */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // jpeg | png | wav | ...
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_channels", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Read a directory of media files as (path, length, content BINARY)
    * via Spark's binaryFile source — the scan-side contract for any
    * media lake layout. */
  def readBinaryDir(spark: org.apache.spark.sql.SparkSession, path: String,
                    glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(path)
      .select(col("path"), col("length"), col("content"))

  // ----- STUB CODEC (deterministic fake; replace with real decoders) -----
  //
  // Every function below consumes/produces the REAL schema and batch
  // shape; only the byte-level media math is faked deterministically from
  // the payload so tests are stable.
  object StubCodec {
    /** "Decode" a payload: fake dimensions derived from content hash. */
    def probe(content: Array[Byte]): (Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(content)
      val w = 64 + math.abs(h % 193)
      val hgt = 64 + math.abs((h / 193) % 129)
      (w, hgt, 3)
    }

    /** "Extract features": d deterministic floats from a rolling hash —
      * stands in for an image-embedding model's output vector. */
    def features(content: Array[Byte], d: Int): Array[Float] = {
      val out = new Array[Float](d)
      var acc = 1469598103934665603L
      var i = 0
      while (i < content.length) {
        acc = (acc ^ content(i)) * 1099511628211L
        out(math.floorMod(i, d)) += (acc % 1000L) / 1000.0f
        i += 1
      }
      out
    }

    /** "Resize": fake a downsampled payload (truncated bytes + new dims
      * recorded in metadata). */
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] =
      java.util.Arrays.copyOf(content, math.min(content.length,
        math.max(16, w * h / 64)))

    /** "Frame-sample": split a video payload into n evenly spaced fake
      * frame payloads. */
    def sampleFrames(content: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val stride = math.max(1, content.length / math.max(n, 1))
      (0 until n).map { i =>
        val from = math.min(i * stride, math.max(content.length - 1, 0))
        java.util.Arrays.copyOfRange(content, from,
          math.min(from + stride, content.length))
      }
    }
  }

  private val metaFor = udf((content: Array[Byte], mediaType: String,
                             format: String) => {
    val (w, h, c) = StubCodec.probe(content)
    MediaMeta(mediaType, format, w, h, c,
      if (mediaType == "video" || mediaType == "audio")
        content.length.toLong else 0L)
  })

  /** Attach typed metadata (decode-probe) to a binary media column. */
  def withMetadata(df: DataFrame, contentCol: String = "content",
                   mediaType: String = "image", format: String = "jpeg")
      : DataFrame =
    df.withColumn("media_meta",
      metaFor(col(contentCol), lit(mediaType), lit(format)))

  /** Feature-extract: one embedding vector per payload. Partition-local
    * (mapPartitions shape — no shuffle); the real version would batch
    * payloads through a model runtime here, so the per-partition iterator
    * IS the batch boundary. */
  def extractFeatures(df: DataFrame, dim: Int = 64,
                      contentCol: String = "content"): DataFrame = {
    val extract = udf((content: Array[Byte]) =>
      StubCodec.features(content, dim))
    df.withColumn("media_embedding", extract(col(contentCol)))
  }

  /** Resize stage: new payload + refreshed metadata. */
  def resize(df: DataFrame, w: Int, h: Int,
             contentCol: String = "content"): DataFrame = {
    val rs = udf((content: Array[Byte]) => StubCodec.resize(content, w, h))
    df.withColumn(contentCol, rs(col(contentCol)))
      .transform(d => withMetadata(d, contentCol))
  }

  /** Frame-sample a video payload into one row per sampled frame
    * (posexplode — the schema contract for video -> image fan-out). The
    * frame index comes straight from the array position: deterministic,
    * no window shuffle, no reliance on row order. */
  def sampleFrames(df: DataFrame, n: Int,
                   contentCol: String = "content"): DataFrame = {
    val sf = udf((content: Array[Byte]) =>
      StubCodec.sampleFrames(content, n))
    df.select(col("*"),
      posexplode(sf(col(contentCol))).as(Seq("frame_index", "frame")))
      .withColumn("frame_index", col("frame_index").cast("long"))
  }
}

/** REAL image-container header parsing over BINARY columns — unlike
  * [[Multimodal.StubCodec]] this is not a fake: PNG dimensions sit at a
  * fixed offset in the IHDR chunk and JPEG dimensions in the first SOF
  * segment, both pure public-format byte arithmetic (PNG spec §11.2.2;
  * JPEG/JFIF ISO 10918 segment structure), so a media lake's width/
  * height/format columns come straight off the binary payloads with no
  * codec library at all.
  *
  * Everything is built from codegen'd built-ins (`hex`, `substr`,
  * `conv`, comparisons) — zero UDFs, so the parse inlines into
  * whole-stage codegen and pushes through a 100 TB binaryFile scan at
  * column speed. The byte walk works on the hex string view (two chars
  * per byte): position arithmetic stays exact and the same logic is
  * expressible in any SQL engine, which is what lets the driver's DuckDB
  * oracle replay it bit-for-bit.
  *
  * Malformed inputs (truncated header, wrong magic, a segment walk that
  * runs off the payload or past [[ImageHeaders.MaxJpegSegments]]) yield
  * NULL format/width/height — never a garbage dimension. */
object ImageHeaders {

  /** JPEG segment-walk bound: APPn/COM/DQT/DHT segments are skipped via
    * their length prefixes until a SOF marker; a file whose SOF sits
    * deeper than this many leading segments parses as NULL (raise for
    * exotic metadata-heavy files — each step is one more inlined
    * expression, not a join). */
  val MaxJpegSegments = 4

  private val PngMagicHex = "89504E470D0A1A0A"
  private val SofMarkers = Seq("FFC0", "FFC1", "FFC2")

  private def beHex(digits: Int, v: Column): Column =
    lpad(hex(v), digits, "0")

  /** Synthesize a minimal well-formed PNG: magic + IHDR chunk (13-byte
    * payload: width, height BE-32, bit depth 8, color type 2 truecolor,
    * zeroed method bytes and CRC) + `body` as opaque trailing data.
    * Dimension fields are REAL per the spec — [[parse]] reads back
    * exactly what went in. */
  def pngBytes(width: Column, height: Column, body: Column): Column =
    // guard the 32-bit BE fields: lpad would TRUNCATE a longer hex
    // string, silently synthesizing a "valid" header with wrong
    // dimensions — out-of-range dims must be NULL, never corrupted
    when(width.between(0L, 0xFFFFFFFFL) &&
        height.between(0L, 0xFFFFFFFFL),
      concat(
        unhex(concat(lit(PngMagicHex + "0000000D49484452"),
          beHex(8, width), beHex(8, height), lit("080200000000000000"))),
        body.cast("binary")))

  /** Synthesize a baseline JFIF JPEG: SOI, APP0 of variable length
    * (5-byte "JFIF\0" identifier + `padBytes` zeros — the length prefix
    * is what the segment walk must honor), an optional zero-payload APP1
    * (`extraApp1` — a second segment to hop), then SOF0 with REAL
    * height/width BE-16 and a standard 3-component spec, and `body` as
    * opaque trailing data. */
  def jpegBytes(width: Column, height: Column, padBytes: Column,
                extraApp1: Column, body: Column): Column = {
    val pad = lit("0" * 512).substr(lit(1), (padBytes * 2).cast("int"))
    // guard the 16-bit BE dimension fields (lpad truncation would keep
    // only the LEADING hex digits of an oversized value) and the pad
    // source's 256-byte cap — out-of-range inputs are NULL, never a
    // well-formed header carrying wrong numbers
    when(width.between(0L, 0xFFFFL) && height.between(0L, 0xFFFFL) &&
        padBytes.between(0L, 256L),
      concat(
        unhex(concat(
          lit("FFD8FFE0"), beHex(4, padBytes + lit(7)), lit("4A46494600"),
          pad,
          when(extraApp1, lit("FFE100040000")).otherwise(lit("")),
          lit("FFC0001108"), beHex(4, height), beHex(4, width),
          lit("03011100021101031101"))),
        body.cast("binary")))
  }

  /** Parse a binary payload's image header: returns a struct
    * `(format STRING, width INT, height INT)` — `png` via the IHDR
    * fixed offsets, `jpeg` via a bounded length-prefixed segment walk to
    * the first SOF0/1/2 marker, all-NULL for anything else.
    *
    * Expression-size discipline (this is a PLANNING problem, not an
    * execution one): every intermediate that is referenced more than
    * once is bound to a lambda variable — the hex view via a 1-element
    * transform, and the segment walk via an `aggregate` fold whose
    * accumulator IS the walk position. A naive unrolled walk embeds
    * pos_i ~6 times inside pos_{i+1}, i.e. a 6^steps-node tree, which
    * cost ~6.4 s of Catalyst optimization per query construction
    * (measured at 4 steps; execution itself was 0.6 s). Bound, the tree
    * is linear in the step count and planning is milliseconds. */
  def parse(content: Column): Column =
    element_at(transform(array(hex(content)), hs =>
      element_at(transform(array(jpegSofPos(hs)), pos =>
        parseAt(hs, pos)), 1)), 1)

  private def markerAt(hexs: Column, pos: Column): Column =
    hexs.substr((pos * 2 - 1).cast("int"), lit(4))

  private def segLen(hexs: Column, pos: Column): Column =
    conv(hexs.substr((pos * 2 + 3).cast("int"), lit(4)), 16, 10)
      .cast("long")

  /** Byte position (1-based) of the first SOF marker, walking at most
    * [[MaxJpegSegments]] length-prefixed segments from the post-SOI
    * position; NULL once the walk leaves the payload or meets a
    * non-marker byte. The fold's accumulator is the position — each
    * step references the BOUND accumulator, keeping the tree linear. */
  private def jpegSofPos(hexs: Column): Column =
    aggregate(
      sequence(lit(1), lit(MaxJpegSegments)),
      lit(3L),
      (pos, _) => {
        val m = markerAt(hexs, pos)
        when(m.isin(SofMarkers: _*), pos)
          .when(m.startsWith("FF") && m =!= "FFD9",
            pos + lit(2L) + segLen(hexs, pos))
          .otherwise(lit(null).cast("long"))
      })

  /** Assemble the result struct from the bound hex view and the bound
    * final walk position. */
  private def parseAt(hexs: Column, pos: Column): Column = {
    val n = (length(hexs) / 2).cast("long")

    // PNG: magic at bytes 1-8, "IHDR" at 13-16, width/height BE-32 at
    // 17-20 / 21-24 (hex chars 33-40 / 41-48)
    val pngOk = n >= 24L && hexs.substr(1, 16) === PngMagicHex &&
      hexs.substr(25, 8) === "49484452"
    val pngW = conv(hexs.substr(33, 8), 16, 10).cast("long")
    val pngH = conv(hexs.substr(41, 8), 16, 10).cast("long")

    // JPEG: SOI then length-prefixed segments; byte position p (1-based)
    // maps to hex char 2p-1. `pos` is the bound final walk position —
    // a SOF marker byte index, or NULL when the walk died (truncation
    // and garbage null-propagate through substr/conv).
    val sof = markerAt(hexs, pos)
    // SOF payload: len(2) precision(1) height(2) width(2) — height at
    // bytes pos+5..pos+6 (hex 2·pos+9), width at pos+7..pos+8 (2·pos+13)
    val jpegOk = n >= 4L && hexs.substr(1, 4) === "FFD8" &&
      sof.isin(SofMarkers: _*) && n >= pos + 8L
    val jH = conv(hexs.substr((pos * 2 + 9).cast("int"), lit(4)), 16, 10)
      .cast("long")
    val jW = conv(hexs.substr((pos * 2 + 13).cast("int"), lit(4)), 16, 10)
      .cast("long")

    struct(
      when(pngOk, lit("png")).when(jpegOk, lit("jpeg")).as("format"),
      when(pngOk, pngW).when(jpegOk, jW).cast("int").as("width"),
      when(pngOk, pngH).when(jpegOk, jH).cast("int").as("height"))
  }
}

/** REAL WAV/RIFF audio-container header parsing over BINARY columns —
  * the audio twin of [[ImageHeaders]] (RIFF chunk structure per the
  * public Microsoft/IBM WAVE spec): channels, sample rate, bit depth,
  * data size, and integral duration come straight off the payload bytes
  * with no codec library. RIFF is LITTLE-endian where PNG/JPEG are big —
  * [[WavHeaders.le]] reads multi-byte fields by reversing byte pairs in
  * the hex view.
  *
  * Same execution discipline as the image parser: codegen'd built-ins
  * only (`hex`, `substr`, `conv`), zero UDFs; the chunk walk (fmt /
  * LIST / data) is an `aggregate` fold whose accumulator carries
  * (position, fmt-chunk pos, data-chunk pos) — bound once per step, so
  * the expression tree is linear in [[WavHeaders.MaxChunks]]. Malformed
  * input (wrong magic, truncation, walk running off the payload) yields
  * an all-NULL struct, never garbage numbers. */
object WavHeaders {

  /** Chunk-walk bound: fmt / LIST / fact / data chunks are skipped via
    * their length prefixes (with RIFF even-byte padding); a file whose
    * data chunk sits deeper than this many chunks parses as NULL. */
  val MaxChunks = 4

  private val RiffHex = "52494646" // "RIFF"
  private val WaveHex = "57415645" // "WAVE"
  private val FmtHex  = "666D7420" // "fmt "
  private val DataHex = "64617461" // "data"

  /** Little-endian hex of `v` in `bytes` bytes (the WRITE side): the
    * big-endian padded hex, byte pairs reversed. */
  private def leHex(bytes: Int, v: Column): Column = {
    val be = lpad(hex(v), bytes * 2, "0")
    concat((bytes - 1 to 0 by -1).map(i => be.substr(i * 2 + 1, 2)): _*)
  }

  /** Unsigned little-endian integer of `nBytes` at 1-based byte
    * position `bytePos` of the hex view (the READ side). */
  private def le(hexs: Column, bytePos: Column, nBytes: Int): Column =
    conv(concat((nBytes - 1 to 0 by -1).map(i =>
      hexs.substr(((bytePos + i) * 2 - 1).cast("int"), lit(2))): _*),
      16, 10).cast("long")

  /** Synthesize a canonical PCM WAV: RIFF header, fmt chunk (format 1,
    * REAL channels / sample rate / derived byte rate + block align /
    * bit depth), an optional `listPad`-byte LIST chunk (so the walk has
    * a length-prefixed chunk to hop), and a data chunk holding `body`.
    * Out-of-range inputs (channels outside 1..255, bits outside
    * {8, 16, 32} — 24-bit PCM is valid WAV but this synthesizer does not
    * emit it, odd or oversized pad, rate outside 1..384000) are
    * NULL — never a well-formed header with corrupt fields. */
  def wavBytes(channels: Column, sampleRate: Column, bits: Column,
               listPad: Column, withList: Column, body: Column): Column = {
    val bin = body.cast("binary")
    val dataLen = length(bin).cast("long")
    val blockAlign = channels * (bits / lit(8L)).cast("long")
    val byteRate = sampleRate * blockAlign
    val listLen = when(withList, lit(8L) + listPad).otherwise(lit(0L))
    val riffLen = lit(36L) + listLen + dataLen
    val listHex = when(withList,
      concat(lit("4C495354"), leHex(4, listPad),
        lit("0" * 512).substr(lit(1), (listPad * 2).cast("int"))))
      .otherwise(lit(""))
    when(channels.between(1L, 255L) && sampleRate.between(1L, 384000L) &&
        bits.isin(8L, 16L, 32L) && listPad.between(0L, 256L) &&
        pmod(listPad, lit(2L)) === 0L,
      concat(
        unhex(concat(
          lit(RiffHex), leHex(4, riffLen), lit(WaveHex),
          lit(FmtHex), leHex(4, lit(16L)), leHex(2, lit(1L)),
          leHex(2, channels), leHex(4, sampleRate), leHex(4, byteRate),
          leHex(2, blockAlign), leHex(2, bits),
          listHex,
          lit(DataHex), leHex(4, dataLen))),
        bin))
  }

  /** Chunk walk from the first subchunk (byte 13): the accumulator is
    * (pos, fmt-chunk byte pos, data-chunk byte pos); each step reads the
    * chunk id and its length prefix, records fmt/data positions, and
    * advances past the (even-padded) payload; the walk parks on the
    * data chunk. NULL position once the walk leaves the payload. */
  private def chunkWalk(hexs: Column): Column =
    aggregate(
      sequence(lit(1), lit(MaxChunks)),
      struct(lit(13L).as("pos"), lit(0L).as("fmt"), lit(0L).as("dat")),
      (acc, _) => {
        val p = acc.getField("pos")
        val cid = hexs.substr((p * 2 - 1).cast("int"), lit(8))
        val size = le(hexs, p + 4L, 4)
        val sizePad = size + pmod(size, lit(2L))
        struct(
          when(length(hexs) < (p * 2 + 15L), lit(null).cast("long"))
            .when(cid === DataHex, p)
            .otherwise(p + lit(8L) + sizePad).as("pos"),
          when(cid === FmtHex && acc.getField("fmt") === 0L, p)
            .otherwise(acc.getField("fmt")).as("fmt"),
          when(cid === DataHex && acc.getField("dat") === 0L, p)
            .otherwise(acc.getField("dat")).as("dat"))
      })

  /** Parse a binary payload's WAV header: struct `(format, channels,
    * sample_rate, bits, data_bytes, duration_ms)` — all NULL unless the
    * RIFF/WAVE magics hold and the walk found both fmt and data chunks
    * inside the payload. duration_ms = data_bytes * 1000 / byte_rate,
    * floored (integer-exact: the quotient's distance from an integer is
    * >= 1/byte_rate, far above double rounding error). */
  def parse(content: Column): Column =
    element_at(transform(array(hex(content)), hs =>
      element_at(transform(array(chunkWalk(hs)), w =>
        parseAt(hs, w)), 1)), 1)

  private def parseAt(hexs: Column, w: Column): Column = {
    val n = (length(hexs) / 2).cast("long")
    val fmtP = w.getField("fmt")
    val datP = w.getField("dat")
    val ok = n >= 44L &&
      hexs.substr(1, 8) === RiffHex && hexs.substr(17, 8) === WaveHex &&
      fmtP > 0L && datP > 0L && n >= datP + 7L && n >= fmtP + 23L
    val channels = le(hexs, fmtP + 10L, 2)
    val rate = le(hexs, fmtP + 12L, 4)
    val byteRate = le(hexs, fmtP + 16L, 4)
    val bits = le(hexs, fmtP + 22L, 2)
    val dataLen = le(hexs, datP + 4L, 4)
    val durMs = when(byteRate > 0L,
      ((dataLen * 1000L) / byteRate).cast("long"))
    struct(
      when(ok, lit("wav")).as("format"),
      when(ok, channels).cast("int").as("channels"),
      when(ok, rate).as("sample_rate"),
      when(ok, bits).cast("int").as("bits"),
      when(ok, dataLen).as("data_bytes"),
      when(ok, durMs).as("duration_ms"))
  }
}
