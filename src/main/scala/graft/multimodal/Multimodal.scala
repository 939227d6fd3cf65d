package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
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
