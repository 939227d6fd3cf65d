package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcast Bloom filters: a fixed-size bit-array membership sketch with
  * NO false negatives, so "not in the filter" is a proof while "in the
  * filter" is a candidate to verify exactly. That asymmetry is the 100 TB
  * lever: an incremental batch probed against a multi-billion-key corpus
  * index answers "definitely new" for the overwhelming majority of rows
  * as a row-local, shuffle-free filter, and only the bloom-positive
  * remainder (true dups + the configured false-positive rate) pays the
  * exact anti-join shuffle. The composed candidates-and-verify output is
  * bit-identical to the plain join — the filter changes the plan, never
  * the answer (same contract as [[Similarity.nearDupPairs]]'s bucketed
  * path).
  *
  * Representation: `numBits` bits as `numBits/64` longs. Bit positions
  * are `xxhash64(i, key) mod numBits` for hash index i — the same
  * expression on the build and probe side by construction, evaluated
  * entirely inside whole-stage codegen (no UDF).
  *
  * Sizing (standard Bloom math): false-positive rate for n keys is
  * ~(1 - e^(-k*n/m))^k; m/n = 10 bits/key with k = 7 gives ~1%. The
  * probe plan embeds the words as one array literal — ~12 MB of plan at
  * 10^8 bits, shipped once per executor with the task binary; size the
  * filter for the INDEX it summarizes, not the corpus it filters.
  *
  * Reference analog: the existence-check-before-recompute in
  * dissertation-iceberg/src/data_pipeline.py:96-118, scaled to key sets
  * that no longer fit an exact broadcast.
  */
object Bloom {

  /** The k bit positions of a key: xxhash64 chained with the hash index
    * as the leading column gives k independent 64-bit hashes; pmod keeps
    * positions in [0, numBits). Shared by build and probe — the two
    * sides can never disagree on where a key's bits live. */
  private def positions(key: Column, numBits: Int,
                        numHashes: Int): Seq[Column] =
    (0 until numHashes).map(i =>
      pmod(xxhash64(lit(i), key), lit(numBits.toLong)))

  private def requireShape(numBits: Int, numHashes: Int): Unit = {
    require(numBits > 0 && numBits % 64 == 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    require(numHashes > 0 && numHashes <= 16,
      s"numHashes must be in [1, 16], got $numHashes")
  }

  /** Build the filter over `key` of every row: ONE distributed pass —
    * explode each key to its k positions, distinct them (partial-agg
    * shuffle of a single long column, at most numBits distinct values),
    * set bits on the driver. The collected set is bounded by the
    * filter's own size regardless of corpus size; the corpus itself is
    * never collected. Null keys set no bits (and probe as misses). */
  def build(df: DataFrame, key: Column, numBits: Int,
            numHashes: Int = 7): Array[Long] = {
    requireShape(numBits, numHashes)
    val words = new Array[Long](numBits / 64)
    // xxhash64 SKIPS null inputs (hashes the remaining args) instead of
    // returning null, so a null key would silently round-trip as a
    // member — exclude nulls explicitly on both sides instead
    df.where(key.isNotNull)
      .select(explode(array(positions(key, numBits, numHashes): _*))
        .as("pos"))
      .distinct()
      .collect()
      .foreach { r =>
        val pos = r.getLong(0)
        words((pos / 64).toInt) |= (1L << (pos % 64).toInt)
      }
    words
  }

  /** Membership probe as a pure Column: true if all k bits are set.
    * Codegen'd end-to-end (element_at + getbit over an array literal) —
    * pushes into the scan like any other filter. False positives at the
    * configured rate; false negatives never (for keys the filter was
    * built over). Null keys are misses (false, not null). */
  def mightContain(key: Column, words: Array[Long], numHashes: Int = 7)
      : Column = {
    requireShape(words.length * 64, numHashes)
    val wordsLit = typedlit(words.toSeq)
    val hit = positions(key, words.length * 64, numHashes)
      .map(pos => getbit(
        element_at(wordsLit, shiftright(pos, 6).cast("int") + lit(1)),
        pos.bitwiseAND(lit(63L)).cast("int")) === lit(1))
      .reduce(_ && _)
    // key.isNotNull: see build — xxhash64 would hash a null key as the
    // seed literal alone, making "null" probe wherever the seeds land
    coalesce(key.isNotNull && hit, lit(false))
  }
}
