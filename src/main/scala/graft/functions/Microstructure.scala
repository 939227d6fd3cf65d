package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure-Column microstructure feature expressions (SURVEY §2.8 F2) — all
  * whole-stage-codegen-friendly arithmetic, no UDFs.
  * References: `/root/reference/prediction_ML_pipeline.py:197-214`,
  * `/root/reference/order_imbalance.py:257-258`.
  */
object Microstructure {

  /** Midprice (ask1+bid1)/2 (`prediction_ML_pipeline.py:197`). */
  def midprice(ask: Column, bid: Column): Column =
    ((ask + bid) / 2.0).as("midprice")

  /** L1 order-flow imbalance (bidSz-askSz)/(bidSz+askSz)
    * (`prediction_ML_pipeline.py:200`). */
  def ofi(bidSize: Column, askSize: Column): Column = {
    val den = bidSize + askSize
    (when(den =!= 0, (bidSize - askSize) / den)).as("ofi")
  }

  /** Size-weighted midprice w*ask + (1-w)*bid, w = bidSz/(bidSz+askSz)
    * (`order_imbalance.py:257-258`). */
  def weightedMidprice(ask: Column, bid: Column, askSize: Column,
                       bidSize: Column): Column = {
    val den = bidSize + askSize
    val w = when(den =!= 0, bidSize / den).otherwise(0.5)
    (w * ask + (lit(1.0) - w) * bid).as("weighted_mp")
  }

  /** Aggressiveness ratio (p - bid)/(ask - bid): <=0 at/below bid (buy side),
    * >=1 at/above ask (`prediction_ML_pipeline.py:210`). */
  def aggRatio(price: Column, ask: Column, bid: Column): Column = {
    val den = ask - bid
    (when(den =!= 0, (price - bid) / den)).as("agg_ratio")
  }

  /** Quoted spread in price ticks. */
  def spread(ask: Column, bid: Column): Column = (ask - bid).as("spread")

  /** Signed size by event type (`prediction_ML_pipeline.py:151-165`,
    * np.select): +dir*size for submissions (1) and visible executions (4),
    * -dir*size for deletes (3), else 0 — the trade-sentiment kernel. */
  def signedSize(eventType: Column, direction: Column, size: Column)
      : Column =
    when(eventType.isin(1, 4), direction * size)
      .when(eventType === 3, -direction * size)
      .otherwise(lit(0L))
      .as("signed_size")

  /** Sentinel-quote validity (`EDA.ipynb` cell 25): LOBSTER uses
    * +/-9999999999 for absent book sides. */
  def validQuote(ask: Column, bid: Column): Column =
    (ask =!= 9999999999L) && (bid =!= -9999999999L)

  /** Log return vs a previous value (W1/W6). */
  def logReturn(cur: Column, prev: Column): Column =
    when(prev.isNotNull && prev =!= 0, log(cur / prev)).as("log_ret")
}
