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

  /** F2 (Cont-Kukanov-Stoikov quote-change OFI, `EDA_SPY.ipynb` cells
    * 22-24): per quote update n vs the previous quote n-1,
    *   e_n = 1{dB>=0}*bidSize_n - 1{dB<=0}*bidSize_{n-1}
    *       - 1{dA<=0}*askSize_n + 1{dA>=0}*askSize_{n-1}
    * where dB/dA are the bid/ask price changes. Both indicators fire on a
    * zero change (size delta at an unchanged price level). Pass lag(...)
    * columns for the prev_* arguments; on the first observation (null
    * prevs) the indicator arithmetic yields NULL — the exact twin of the
    * reference's 0 * NaN = NaN, so downstream sums skip it identically. */
  def contOfi(bid: Column, ask: Column, bidSize: Column, askSize: Column,
              prevBid: Column, prevAsk: Column,
              prevBidSize: Column, prevAskSize: Column): Column = {
    val db = bid - prevBid
    val da = ask - prevAsk
    ((db >= 0).cast("int") * bidSize - (db <= 0).cast("int") * prevBidSize -
      (da <= 0).cast("int") * askSize + (da >= 0).cast("int") * prevAskSize)
      .as("en")
  }

  /** Sentinel-quote validity (`EDA.ipynb` cell 25): LOBSTER uses
    * +/-9999999999 for absent book sides. */
  def validQuote(ask: Column, bid: Column): Column =
    (ask =!= 9999999999L) && (bid =!= -9999999999L)

  /** Log return vs a previous value (W1/W6). */
  def logReturn(cur: Column, prev: Column): Column =
    when(prev.isNotNull && prev =!= 0, log(cur / prev)).as("log_ret")
}
