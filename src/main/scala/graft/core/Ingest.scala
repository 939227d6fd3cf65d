package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scan-side operators (SURVEY §2.1 S1-S4, §7.1 module 2).
  *
  * The reference streams per-(ticker,day) CSV pairs out of 7z archives
  * (`/root/reference/chunk_pipeline.py:36-48`, `119-138`); our ingest
  * converts that layout once into partitioned parquet and reads it back
  * with explicit schemas. Headerless-CSV reading (S2), filename metadata
  * (S3) and multi-file concat (S4) are all one `spark.read` with schema +
  * `input_file_name()` — the glob union and column pruning are native.
  */
object Ingest {

  /** S2/S4: headerless LOBSTER message CSVs under `path` (glob ok), with
    * S3 filename metadata: LOBSTER names are
    * `TICKER_YYYY-MM-DD_..._message_LEVELS.csv`
    * (`prediction_ML_pipeline.py:22-28`). */
  def messagesCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schema.rawMessage).csv(path)
      .withColumn("__file", input_file_name())
      .withColumn("ticker",
        regexp_extract(col("__file"), "([A-Z.]+)_\\d{4}-\\d{2}-\\d{2}", 1))
      .withColumn("date",
        to_date(regexp_extract(col("__file"), "(\\d{4}-\\d{2}-\\d{2})", 1)))
      .transform(withSeq)
      .drop("__file")

  /** S2 for the orderbook side (L1 projection at scan — Spark prunes the
    * remaining 36 columns when the file has 10 levels). */
  def quotesCsv(spark: SparkSession, path: String, levels: Int = 1)
      : DataFrame = {
    val full = spark.read.schema(Schema.rawQuote(math.max(levels, 1)))
      .csv(path)
      .withColumn("__file", input_file_name())
      .withColumn("ticker",
        regexp_extract(col("__file"), "([A-Z.]+)_\\d{4}-\\d{2}-\\d{2}", 1))
      .withColumn("date",
        to_date(regexp_extract(col("__file"), "(\\d{4}-\\d{2}-\\d{2})", 1)))
      .transform(withSeq)
      .drop("__file")
    full.select((Schema.rawQuoteL1.fieldNames.toSeq ++
      Seq("ticker", "date", "seq")).map(col): _*)
  }

  /** The explicit event order pandas gets for free from file row order
    * (SURVEY §7.4.1): per-file monotonic sequence. Uses
    * monotonically_increasing_id, which is monotone WITHIN a partition —
    * and a single CSV file split into partitions preserves block order in
    * the id's partition prefix, so ordering by it reproduces file order. */
  private def withSeq(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("__file"))
      .orderBy(col("__mid"))
    df.withColumn("__mid", monotonically_increasing_id())
      .withColumn("seq", row_number().over(w).cast("long") - 1)
      .drop("__mid")
  }

  /** J1 positional align: messages ⋈ L1 quotes on (ticker, date, seq) —
    * the explicit form of `df_ob.index = df_m.index`
    * (`prediction_ML_pipeline.py:106`). Equi-join, co-partitioned by the
    * same keys, AQE-broadcastable per day. */
  def alignMessagesQuotes(messages: DataFrame, quotes: DataFrame)
      : DataFrame =
    messages.join(quotes, Seq("ticker", "date", "seq"))

  /** Event-time column from trade date + seconds after midnight
    * (`prediction_ML_pipeline.py:39-45`). Microsecond precision (Spark
    * TimestampType); `time_s` keeps the exact ns-precision double. */
  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("event_time",
      timestamp_micros((unix_date(col("date")).cast("long") * 86400000000L) +
        (col("time_s") * 1e6).cast("long")))

  /** S9/ingest sink: write the event table partitioned by (ticker, date) —
    * the partition-pruning layout every downstream query filters on. */
  def writeEvents(df: DataFrame, path: String,
                  mode: String = "overwrite"): Unit =
    df.write.mode(mode).partitionBy("ticker", "date").parquet(path)

  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
