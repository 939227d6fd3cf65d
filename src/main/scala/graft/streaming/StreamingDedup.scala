package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Streaming faces of the dedup and sampling families (extension, SURVEY
  * §2.10 shape): a training-data ingest stream wants "keep the first copy
  * of each document, sample deterministically, tag the split" as the data
  * ARRIVES, not as a nightly batch.
  *
  * State discipline is the scale story: exact streaming dedup keys state
  * by a 128-bit content digest (16 bytes + key overhead per distinct doc,
  * never the text), and `dropDuplicatesWithinWatermark` lets the engine
  * evict state once the watermark passes — bounded memory under unbounded
  * input, the streaming analog of `Dedup.exact`'s one-shuffle groupBy.
  *
  * The Sampling filters need no streaming variant at all: a pure
  * row-local hash filter is trivially stateless, so the SAME operator
  * runs in both modes — that layout-independence is exactly why the
  * sampler hashes content keys instead of drawing per-partition randoms
  * (`df.sample` is nondeterministic under micro-batch replay; a hash
  * filter re-admits the same rows on retry).
  */
object StreamingDedup {

  /** First-copy-wins exact dedup over a content column within a watermark
    * horizon. Emits each distinct digest's first-arriving row; a
    * duplicate arriving inside the horizon is dropped, and state for a
    * digest is evicted once the watermark passes its event time (re-sent
    * copies later than the horizon are the caller's at-least-once
    * trade-off, exactly as documented for the engine primitive). */
  def firstCopy(docs: DataFrame, contentCol: String,
                timeCol: String = "event_time",
                watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__digest", md5(col(contentCol).cast("string")))
      .withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Deterministic Bernoulli sampling of a stream: the batch operator
    * verbatim — stateless, replay-stable (a retried micro-batch keeps
    * exactly the same rows). */
  def sampleStream(docs: DataFrame, keyCol: String, fraction: Double,
                   seed: Long = 0L): DataFrame =
    Sampling.bernoulliSample(docs, keyCol, fraction, seed)

  /** Deterministic split tag on a stream (batch operator verbatim). */
  def splitStream(docs: DataFrame, keyCol: String, testFraction: Double,
                  seed: Long = 0L, tagCol: String = "is_test"): DataFrame =
    Sampling.hashSplitTag(docs, keyCol, testFraction, seed, tagCol)
}
