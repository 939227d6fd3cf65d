package graft.sources

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Schema

/** Auxiliary sources replacing the reference's external feeds with
  * reproducible tables (SURVEY §2.1 S5-S11).
  */
object AuxSources {

  /** S5: Fama-French factor CSV in the published Ken-French layout —
    * 3 banner lines, `Date,SMB,HML,RF,CMA,RMW` header-ish rows with
    * yyyyMMdd dates, and a trailing annual-data section the reference
    * drops (`/root/reference/order_imbalance.py:116-129`). Malformed /
    * banner rows are filtered by the date regex rather than skipRows, so
    * the read is position-independent (safe under multi-file globs). */
  def ffFactorsCsv(spark: SparkSession, path: String,
                   minDate: String = "2018-01-01"): DataFrame = {
    // explicit 6-string schema: banner lines would otherwise drive
    // schema inference to a single column
    val raw = spark.read
      .schema("date_str STRING, SMB STRING, HML STRING, RF STRING, " +
        "CMA STRING, RMW STRING")
      .option("header", "false").option("mode", "PERMISSIVE")
      .csv(path)
    raw.filter(col("date_str").rlike("^\\s*\\d{8}\\s*$"))
      .select(to_date(trim(col("date_str")), "yyyyMMdd").as("date"),
        col("SMB").cast("double"), col("HML").cast("double"),
        col("RF").cast("double"), col("CMA").cast("double"),
        col("RMW").cast("double"))
      .filter(col("date") >= lit(minDate))
  }

  /** S11: trading-calendar table — weekdays minus a supplied holiday list
    * (stands in for exchange_calendars XNYS;
    * `/root/reference/trading_strategy.py:114-120`). Generated
    * distributedly via sequence+explode; no driver loop. */
  def tradingDays(spark: SparkSession, start: String, end: String,
                  holidays: Seq[String] = Nil): DataFrame = {
    val hol = holidays.map(Date.valueOf)
    spark.range(1).select(explode(sequence(
        lit(Date.valueOf(start)), lit(Date.valueOf(end)),
        expr("interval 1 day"))).as("date"))
      .withColumn("dow", dayofweek(col("date"))) // 1=Sun .. 7=Sat
      .withColumn("is_session",
        col("dow").between(2, 6) && !col("date").isInCollection(
          if (hol.isEmpty) Seq(Date.valueOf("1900-01-01")) else hol))
      .drop("dow")
  }

  /** S9: CSV sink mirroring `save_dataframe_to_folder`
    * (`prediction_ML_pipeline.py:366-374`) — header, overwrite per
    * folder. Parquet is the performance path; CSV kept for parity. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** S10: model artifact I/O is Spark ML's native writer
    * (`model.write.overwrite.save(path)` / `PipelineModel.load(path)`);
    * see DirectionModelSpec round-trip. */
  def saveModel(model: org.apache.spark.ml.PipelineModel,
                path: String): Unit =
    model.write.overwrite().save(path)

  def loadModel(path: String): org.apache.spark.ml.PipelineModel =
    org.apache.spark.ml.PipelineModel.load(path)

  /** S7 retry adapter — the SHAPE of the reference's external-feed fetch
    * (`/root/reference/order_imbalance.py:51-81`: yfinance download, up
    * to 10 attempts, 5 s delay between attempts, then give up loudly).
    * The engine itself makes no network calls (zero-egress environment;
    * fixture tables replace the feed), but the adapter is part of the
    * source surface: it wraps ANY DataFrame loader into a retried one.
    * Driver-side by design — opening a source is a driver action, and
    * the returned frame's EXECUTION failures are covered by Spark's own
    * task retries, not this loop. `sleep` is injectable so specs don't
    * wait out real delays. */
  def fetchWithRetry(load: () => DataFrame, maxAttempts: Int = 10,
                     delayMs: Long = 5000L,
                     sleep: Long => Unit = Thread.sleep): DataFrame = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      try return load()
      catch { case e: Exception =>
        last = e
        attempt += 1
        if (attempt < maxAttempts) sleep(delayMs)
      }
    }
    throw new RuntimeException(
      s"source fetch failed after $maxAttempts attempts", last)
  }

  /** Synthetic daily-bars fixture (S7 replacement): deterministic OHLC
    * walk per ticker over the trading calendar. */
  def syntheticDailyBars(spark: SparkSession, tickers: Seq[String],
                         start: String, end: String, seed: Long = 42L)
      : DataFrame = {
    val days = tradingDays(spark, start, end)
      .filter(col("is_session")).select("date")
    val t = spark.createDataFrame(
      tickers.map(Tuple1(_))).toDF("ticker")
    days.crossJoin(t)
      .withColumn("h", abs(xxhash64(col("ticker"), col("date"), lit(seed))))
      .withColumn("open", lit(100.0) + (col("h") % 1000) / 100.0)
      .withColumn("close",
        col("open") * (lit(1.0) + ((col("h") % 41) - 20) / lit(1000.0)))
      .withColumn("adj_close", col("close"))
      .withColumn("volume", (col("h") % 1000000 + 100000).cast("long"))
      .drop("h")
      .select(Schema.dailyBars.fieldNames.map(col): _*)
  }

  /** JSONL (newline-delimited JSON) corpus reader — the pretraining
    * interchange format. Read as TEXT + one `from_json` parse rather
    * than the json source: (a) the json source forbids projecting the
    * corrupt-record column alone (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so
    * a bad-line audit would need a 100 TB cache; (b) the same code runs
    * verbatim under `readStream.text`. Explicit schema (inference would
    * scan the corpus twice and silently widen types between crawls);
    * malformed or type-mismatched lines land whole in
    * `_corrupt_record` with data columns null instead of failing the
    * job. Text reads are line-splittable — one 10 TB file still
    * parallelizes by file range. */
  def readJsonl(spark: SparkSession, path: String,
                schemaDdl: String): DataFrame = {
    val dataSchema = org.apache.spark.sql.types.StructType
      .fromDDL(schemaDdl)
    val parseSchema = dataSchema
      .add("_corrupt_record", org.apache.spark.sql.types.StringType)
    val raw = spark.read.text(path).toDF("__line")
      .where(length(col("__line")) > 0)
      .select(col("__line"), from_json(col("__line"), parseSchema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("__j"))
    val dataCols = dataSchema.fieldNames.toSeq
      .map(n => col("__j").getField(n).as(n))
    // belt and braces: a null struct (nothing parseable at all) also
    // counts as corrupt, carrying the raw line
    val corrupt = coalesce(col("__j").getField("_corrupt_record"),
      when(col("__j").isNull, col("__line")))
    raw.select(dataCols :+ corrupt.as("_corrupt_record"): _*)
  }

  /** Split a [[readJsonl]] frame into (good, corrupt): good rows drop
    * the capture column; corrupt rows keep the raw line. A row is
    * corrupt iff the capture column is non-null. */
  def jsonlSplit(df: DataFrame): (DataFrame, DataFrame) = {
    val good = df.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val bad = df.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (good, bad)
  }

  /** JSONL sink (one line per row, overwrite). Gzip-compressible via
    * the codec option upstream; kept uncompressed here for splittable
    * re-reads. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
