package graft.core

import org.apache.spark.sql.types._

/** Fixed schemas for the LOBSTER-shaped domain tables (FIXTURES.md §1-§7;
  * reference headers `/root/reference/prediction_ML_pipeline.py:36,87-96`).
  * Schemas are code-assigned constants — no inference, no evolution —
  * exactly as the reference names headerless CSVs programmatically.
  */
object Schema {

  /** LOBSTER event types (public LOBSTER spec; SURVEY §1.1). */
  object EventType {
    val Submit = 1          // new limit order
    val PartialCancel = 2
    val Delete = 3
    val VisibleExec = 4
    val HiddenExec = 5      // execution of a hidden order
    val Cross = 6
    val Halt = 7
  }

  /** Sentinel quote values for an absent book side (`EDA.ipynb` cell 25). */
  val NoAskSentinel: Long = 9999999999L
  val NoBidSentinel: Long = -9999999999L

  /** Raw LOBSTER message CSV columns, in file order
    * (`prediction_ML_pipeline.py:36`). */
  val rawMessage: StructType = StructType(Seq(
    StructField("time_s", DoubleType, nullable = false),
    StructField("event_type", IntegerType, nullable = false),
    StructField("order_id", LongType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("price", LongType, nullable = false),
    StructField("direction", IntegerType, nullable = false)))

  /** Raw LOBSTER orderbook CSV truncated to L1, in file order
    * (`chunk_pipeline.py:47` usecols=[0..3]). */
  val rawQuoteL1: StructType = StructType(Seq(
    StructField("ask_price_1", LongType, nullable = false),
    StructField("ask_size_1", LongType, nullable = false),
    StructField("bid_price_1", LongType, nullable = false),
    StructField("bid_size_1", LongType, nullable = false)))

  /** Full orderbook schema for `levels` book levels (reference reads 10,
    * uses 1; `prediction_ML_pipeline.py:87-96`). */
  def rawQuote(levels: Int): StructType = StructType(
    (1 to levels).flatMap(i => Seq(
      StructField(s"ask_price_$i", LongType, nullable = false),
      StructField(s"ask_size_$i", LongType, nullable = false),
      StructField(s"bid_price_$i", LongType, nullable = false),
      StructField(s"bid_size_$i", LongType, nullable = false))))

  /** Ingested event table: messages + L1 quotes row-aligned at the source
    * (J1 — they are positionally 1:1 in LOBSTER), plus the ingest-time
    * columns that make pandas' implicit row order explicit (SURVEY §7.4.1):
    * `seq` is the per-(ticker,date) file row number; every window/agg
    * downstream orders by (event_time, seq). */
  val event: StructType = StructType(
    rawMessage.fields.toSeq ++ rawQuoteL1.fields.toSeq ++ Seq(
      StructField("ticker", StringType, nullable = false),
      StructField("date", DateType, nullable = false),
      StructField("seq", LongType, nullable = false),
      StructField("event_time", TimestampType, nullable = false)))

  val dailyBars: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("ticker", StringType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("adj_close", DoubleType, nullable = false),
    StructField("volume", LongType, nullable = false)))

  val ffFactors: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("SMB", DoubleType, nullable = false),
    StructField("HML", DoubleType, nullable = false),
    StructField("RF", DoubleType, nullable = false),
    StructField("CMA", DoubleType, nullable = false),
    StructField("RMW", DoubleType, nullable = false)))

  val tradingDays: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("is_session", BooleanType, nullable = false)))
}
