package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and splitting for large-scale
  * training-data pipelines.
  *
  * Spark's own `df.sample` / `randomSplit` draw per-partition pseudo-random
  * streams: the selected set changes when the frame is recomputed, when
  * the partition layout changes (AQE, coalesce, different input splits),
  * or when an executor retries a task. At 100 TB that nondeterminism is a
  * correctness hazard — a train/test split must not depend on physical
  * layout, and a rerun must reproduce the same sample bit-for-bit.
  *
  * Everything here keys off a content hash of a stable row key instead:
  *   a    = (key + seed) mod 2^31
  *   h    = ((a * 2654435761) >> 16) mod 2^20        (Knuth multiplicative
  *          hash; the middle bits of the 51-bit product are well-mixed)
  * `h` is uniform on [0, 2^20) and every step is plain positive-BIGINT
  * arithmetic — no engine-specific hash function — so the exact same
  * expression runs in any SQL engine (the DuckDB oracle gates do), and
  * the sample is a pure function of (key, seed).
  *
  * Scale notes: [[bernoulliSample]] / [[hashSplitTag]] are pure row-local
  * filters/projections — no shuffle, fully pushed into the scan.
  * [[stratifiedExactN]] is one window shuffle on the strata key.
  */
object Sampling {

  /** Hash range: 2^20 buckets (~1e-6 sampling-fraction granularity). */
  val HashRange: Long = 1L << 20

  /** Guard against the silent-empty trap: a non-numeric key column would
    * cast to null, hash to null, and fail every `hash < threshold`
    * filter — dropping ALL rows without an error. Every keyed operator
    * here validates the key's type up front instead. */
  private[operators] def requireIntegralKey(df: DataFrame,
                                            keyCol: String): Unit = {
    import org.apache.spark.sql.types._
    df.schema(keyCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"Sampling key column '$keyCol' must be an integral id, got " +
          s"${other.sql} — hash a surrogate (e.g. monotonically stable " +
          "numeric id or xxhash64 of the natural key) first")
    }
  }

  /** Engine-portable string key: the classic base-31 polynomial hash
    * over character code points, mod 2^31 — `h = (h*31 + code) % 2^31`
    * left-to-right. Feed the result through [[mix31]]/[[bucketHash]]
    * (which every sketch/sampler does anyway) — the polynomial itself
    * is NOT avalanche-quality, it only folds a string into a portable
    * integer key deterministically.
    *
    * Intended for TOKENS (words, tags, short codes): the per-character
    * fold is linear in string length and the documented SQL twin
    * (list_reduce over unicode code points) matches it bit-for-bit on
    * BMP text. Null maps to null (callers' null-key guards apply);
    * empty string maps to 0. Intermediates stay below 2^36. */
  def stringKey31(s: Column): Column =
    // Spark's sequence counts DOWN for inverted bounds, so the empty
    // string needs an explicit 0 (sequence(1,0) would be [1,0])
    when(s.isNull, lit(null).cast("long"))
      .when(length(s) === 0, lit(0L))
      .otherwise(aggregate(
        transform(sequence(lit(1), length(s)),
          i => ascii(s.substr(i, lit(1)))),
        lit(0L),
        (h, c) => (h * lit(31L) + c.cast("long"))
          .bitwiseAND(lit(2147483647L))))

  /** The portable bucket hash in [0, HashRange): the top 20 bits of
    * [[mix31]]. Any long key works: `pmod` keeps the Spark side
    * non-negative, and the documented SQL twin uses the positive-mod
    * form (`(x % m + m) % m`) so sign-of-dividend engines (DuckDB,
    * PostgreSQL) agree bit-for-bit on negative keys.
    *
    * This was originally a SINGLE multiplicative round; that version's
    * draws over consecutive keys form an arithmetic progression mod 2^20
    * (stride A>>16 ~ 40503), so for a fixed seed a Bernoulli keep-set
    * came out as contiguous key STRIPES — with chronologically assigned
    * ids, a test split clustered in time. The avalanche rounds kill the
    * stripes; every threshold/fraction contract is unchanged. */
  def bucketHash(key: Column, seed: Long = 0L): Column =
    bucketHashCol(key, lit(seed))

  /** [[bucketHash]] with a per-row seed column (the sketch operators
    * derive one seed per hash row from a single base seed). */
  def bucketHashCol(key: Column, seed: Column): Column =
    shiftright(mix31(key, seed), 11)

  /** Avalanche-quality portable hash: a 31-bit value after THREE
    * multiply-shift-truncate rounds with xor-folding between them.
    *
    * A SINGLE multiplicative round has a uniform marginal, but its
    * draws are affinely related across both shifted seeds
    * ((a+c)*A = a*A + c*A) and consecutive keys (an arithmetic
    * progression mod 2^20 — Bernoulli keep-sets came out striped).
    * Anything that needs JOINT independence across draws — every
    * sampler over structured ids, HLL's (bucket, rho) split, CMS's
    * depth rows, any leading-zero statistic — needs this mixer: the
    * xor-folds break the linearity. Two rounds still showed mild
    * adjacent-key anti-correlation (6165 decision runs per 10k ids vs
    * the iid ~5000); three rounds measure clean (4958) and HLL
    * estimates on adversarially structured key sets (sequential,
    * even-only, 7919-strided) land within ~2% of truth (SketchesSpec
    * and SamplingSpec pin both properties).
    *
    * Every intermediate stays below 2^63 ((2^31-1) * C with C < 2^32),
    * so no engine hits signed-64 overflow; >>13 on non-negative values
    * is integer division by 8192 — the documented DuckDB twin is plain
    * BIGINT arithmetic plus xor(). */
  def mix31(key: Column, seed: Column): Column = {
    val rounds = Seq(2654435761L, 2246822519L, 3266489917L)
    // mod 2^31 spelled as AND (2^31-1): bit-identical to pmod for any
    // sign (two's complement), one codegen op instead of mod+correction.
    // The SQL twins keep the positive-mod form — values agree exactly.
    def mod31(c: Column): Column = c.bitwiseAND(lit(2147483647L))
    rounds.foldLeft(mod31(key.cast("long") + seed)) {
      (x, c) =>
        val y = mod31(shiftright(x * lit(c), 13))
        y.bitwiseXOR(shiftright(y, 16))
    }
  }

  /** [[bucketHash]] scaled to a unit double in [0, 1). */
  def unitHash(key: Column, seed: Long = 0L): Column =
    bucketHash(key, seed).cast("double") / lit(HashRange.toDouble)

  /** Integer acceptance threshold for a fraction (round-half-up). */
  def threshold(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0, 1], got $fraction")
    math.floor(fraction * HashRange + 0.5).toLong
  }

  /** Deterministic Bernoulli sample: keep rows with hash below the
    * fraction threshold. Stable across reruns, retries, and repartitioning
    * (unlike `df.sample`); disjoint seeds give independent samples. */
  def bernoulliSample(df: DataFrame, keyCol: String, fraction: Double,
                      seed: Long = 0L): DataFrame = {
    requireIntegralKey(df, keyCol)
    df.filter(bucketHash(col(keyCol), seed) < lit(threshold(fraction)))
  }

  /** Deterministic train/test tag (the M4 scale path: `randomSplit`
    * resamples on every recompute; this never does). `tagCol` is true for
    * the test rows (~`testFraction` of the keys). */
  def hashSplitTag(df: DataFrame, keyCol: String, testFraction: Double,
                   seed: Long = 0L, tagCol: String = "is_test"): DataFrame = {
    requireIntegralKey(df, keyCol)
    df.withColumn(tagCol,
      bucketHash(col(keyCol), seed) < lit(threshold(testFraction)))
  }

  /** Exact-N-per-stratum sample — a deterministic reservoir: the `n` rows
    * with the smallest (hash, key) per stratum. One window shuffle; ties
    * impossible (key breaks them). */
  def stratifiedExactN(df: DataFrame, strataCols: Seq[String],
                       keyCol: String, n: Int, seed: Long = 0L): DataFrame = {
    require(strataCols.nonEmpty, "stratifiedExactN needs at least one stratum column")
    requireIntegralKey(df, keyCol)
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(bucketHash(col(keyCol), seed), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n).drop("__rk")
  }

  /** Weighted source mixing: per-source Bernoulli rates in one pass (the
    * "sample source A at 10%, B at 100%, drop the rest" pretrain-mix
    * shape). Row-local filter, no shuffle. */
  def mixSources(df: DataFrame, sourceCol: String,
                 rates: Map[String, Double], keyCol: String,
                 seed: Long = 0L): DataFrame = {
    require(rates.nonEmpty, "mixSources needs at least one source rate")
    requireIntegralKey(df, keyCol)
    val thr = rates.foldLeft(lit(0L)) { case (acc, (src, rate)) =>
      when(col(sourceCol) === lit(src), lit(threshold(rate))).otherwise(acc)
    }
    df.filter(bucketHash(col(keyCol), seed) < thr)
  }

  /** Per-row weighted acceptance sampling: keep a row with probability
    * `weightCol` (clamped to [0, 1]) — quality-weighted downsampling in
    * one deterministic row-local pass. The acceptance threshold uses the
    * same floor(w * 2^20 + 0.5) integer arithmetic as [[threshold]], so
    * it is engine-portable. Null weights drop the row. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     seed: Long = 0L): DataFrame = {
    requireIntegralKey(df, keyCol)
    val w = least(greatest(col(weightCol).cast("double"), lit(0.0)),
      lit(1.0))
    val thr = floor(w * lit(HashRange.toDouble) + lit(0.5)).cast("long")
    df.filter(bucketHash(col(keyCol), seed) < thr)
  }

  /** Three-way train/validation/test tag from one hash draw: disjoint
    * bucket ranges, so the splits are exactly exhaustive and any two
    * fractions pin the third. Returns `splitCol` in {'test','val',
    * 'train'}. */
  def hashSplit3Tag(df: DataFrame, keyCol: String, testFraction: Double,
                    valFraction: Double, seed: Long = 0L,
                    splitCol: String = "split"): DataFrame = {
    require(testFraction + valFraction <= 1.0,
      s"test + val fractions exceed 1: $testFraction + $valFraction")
    requireIntegralKey(df, keyCol)
    val h = bucketHash(col(keyCol), seed)
    val t1 = threshold(testFraction)
    val t2 = threshold(testFraction + valFraction)
    df.withColumn(splitCol,
      when(h < lit(t1), lit("test"))
        .when(h < lit(t2), lit("val"))
        .otherwise(lit("train")))
  }

  /** Deterministic epoch replication (Llama-style data-mix upweighting):
    * a row with weight w appears floor(w) times plus one more with
    * probability frac(w) — expectation exactly w epochs, decided by the
    * same portable hash, so reruns replicate identically. Weights < 0
    * are treated as 0; null weights yield zero copies. The explode is
    * row-local (a Generate, no shuffle); copies carry `copyCol` =
    * 1..n_copies for downstream de-correlation (e.g. seeding augmentation
    * per copy). */
  def upsampleEpochs(df: DataFrame, keyCol: String, weightCol: String,
                     seed: Long = 0L, copyCol: String = "epoch_copy")
      : DataFrame = {
    requireIntegralKey(df, keyCol)
    val w = greatest(col(weightCol).cast("double"), lit(0.0))
    val base = floor(w).cast("long")
    val fracThr = floor((w - floor(w)) * lit(HashRange.toDouble) + lit(0.5))
      .cast("long")
    val extra = (bucketHash(col(keyCol), seed) < fracThr).cast("long")
    val copies = coalesce(base + extra, lit(0L))
    // guard: Spark's sequence COUNTS DOWN for inverted bounds, so zero
    // copies must map to an empty array (row dropped), not [1, 0]
    df.withColumn(copyCol, explode(
      when(copies >= 1, sequence(lit(1L), copies))
        .otherwise(array().cast("array<bigint>"))))
  }

  /** Copy count of [[upsampleEpochs]] without the explode — the
    * SQL-checkable face (and a cheap audit column). */
  def epochCopies(keyCol: Column, weightCol: Column,
                  seed: Long = 0L): Column = {
    val w = greatest(weightCol.cast("double"), lit(0.0))
    val fracThr = floor((w - floor(w)) * lit(HashRange.toDouble) + lit(0.5))
      .cast("long")
    coalesce(floor(w).cast("long") +
      (bucketHash(keyCol, seed) < fracThr).cast("long"), lit(0L))
  }

  /** Token-budget mixture plan — the pretraining "temperature sampling"
    * recipe (multilingual-LM alpha-sampling shape): per-source weights
    * w_s proportional to n_s^alpha, per-source epoch rate
    * r_s = B * w_s / n_s for token budget B. alpha=1 keeps natural
    * proportions, alpha=0 gives uniform source weights, 0.5 is the
    * common square-root temperature. Rates above `maxEpochs` are capped
    * (single-pass cap: the freed budget is NOT redistributed — callers
    * wanting exact-B under caps should iterate).
    *
    * Exactly ONE aggregation pass over the corpus; the per-source math
    * runs on the driver over #sources rows (bounded — a mixture has
    * tens of sources, never millions) in integer arithmetic:
    * s_micro = floor(n^alpha * 1e6 + 0.5), then
    * rate_micro = round(B * s_micro * 1e6 / (n_s * S)) via BigInt, so
    * the plan is bit-identical on any engine (for alpha=0.5,
    * n^alpha = sqrt(n) is IEEE-correctly-rounded everywhere).
    *
    * Returns the plan frame (source, n_tokens, rate_micro), rate in
    * epochs-per-row micro-units.
    *
    * Contract: rows with a NULL source are EXCLUDED from the plan (a
    * mixture source is an identity; an unattributed row cannot receive
    * a rate, and [[applyMixture]]'s plan join would drop it anyway).
    * Clean the corpus first if NULL sources should participate. */
  def mixturePlan(df: DataFrame, sourceCol: String, tokenCol: String,
                  budgetTokens: Long, alpha: Double = 0.5,
                  maxEpochs: Double = 1e6): DataFrame = {
    require(budgetTokens >= 0, s"budget must be >= 0, got $budgetTokens")
    require(alpha >= 0.0 && alpha <= 1.0,
      s"alpha must be in [0, 1], got $alpha")
    require(maxEpochs > 0.0, s"maxEpochs must be positive, got $maxEpochs")
    val spark = df.sparkSession
    val counts = df.where(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).as("source"))
      .agg(sum(col(tokenCol).cast("long")).as("n_tokens"))
      .collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    val sMicro = counts.map { case (_, n) =>
      BigInt(math.floor(math.pow(math.max(n, 0L).toDouble, alpha) * 1e6
        + 0.5).toLong)
    }
    val totalS = sMicro.sum
    val capMicro = BigInt(math.floor(maxEpochs * 1e6 + 0.5).toLong)
    val rows = counts.zip(sMicro).map { case ((src, n), s) =>
      val rate =
        if (totalS == 0 || n <= 0L) BigInt(0)
        else {
          val num = 2 * BigInt(budgetTokens) * s * 1000000 + BigInt(n) * totalS
          val den = 2 * BigInt(n) * totalS
          (num / den).min(capMicro) // round-half-up, then cap
        }
      (src, n, rate.toLong)
    }
    import spark.implicits._
    spark.createDataset(rows.toSeq)
      .toDF("source", "n_tokens", "rate_micro")
  }

  /** Apply a [[mixturePlan]]: broadcast the plan onto the corpus and
    * replicate rows via [[upsampleEpochs]] (floor(rate) copies + one
    * more with probability frac(rate), decided by the portable hash —
    * expectation exactly rate epochs, rerun/layout-stable). Rows from
    * sources absent from the plan get zero copies. Row-local after the
    * broadcast join; no shuffle. */
  def applyMixture(df: DataFrame, sourceCol: String, keyCol: String,
                   plan: DataFrame, seed: Long = 0L,
                   copyCol: String = "epoch_copy"): DataFrame = {
    requireIntegralKey(df, keyCol)
    val p = broadcast(plan.select(col("source").as("__mx_source"),
      (col("rate_micro").cast("double") / 1e6).as("__mx_rate")))
    val joined = df.join(p, df(sourceCol) === col("__mx_source"), "left")
      .withColumn("__mx_rate", coalesce(col("__mx_rate"), lit(0.0)))
      .drop("__mx_source")
    upsampleEpochs(joined, keyCol, "__mx_rate", seed, copyCol)
      .drop("__mx_rate")
  }

  /** Deterministic weighted sample WITHOUT replacement (Efraimidis &
    * Spirakis 2006, algorithm A-ES): each row draws u = (hash+1)/2^20
    * in (0, 1] and ranks by u^(1/w); the k largest ranks form a sample
    * with the same inclusion law as k sequential weighted draws without
    * replacement — the quality-weighted "pick the best k docs, but
    * stochastically" corpus-selection shape.
    *
    * Deterministic (a pure function of key and seed, like every sampler
    * here) and scale-safe: the plan is `TakeOrderedAndProject` — a
    * per-partition bounded heap, no global sort shuffle. Rows with null
    * or non-positive weight are excluded (they cannot be drawn). The
    * rank is exposed nano-rounded (`rankCol`, floor(u^(1/w)*1e9+0.5))
    * with the key as tie-break, so the selected set is engine-portable:
    * libm `pow` disagreements are ulps, and a selection flip needs two
    * ranks within 1e-9 of each other AND of the cut. */
  def weightedTopK(df: DataFrame, keyCol: String, weightCol: String,
                   k: Int, seed: Long = 0L,
                   rankCol: String = "es_rank_nano"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    requireIntegralKey(df, keyCol)
    val u = (bucketHash(col(keyCol), seed) + lit(1L)).cast("double") /
      lit(HashRange.toDouble)
    val w = col(weightCol).cast("double")
    df.filter(w.isNotNull && w > 0.0)
      .withColumn(rankCol,
        floor(pow(u, lit(1.0) / w) * lit(1e9) + lit(0.5)).cast("long"))
      .orderBy(col(rankCol).desc, col(keyCol).asc)
      .limit(k)
  }

  /** [[weightedTopK]] within each group — the per-stratum A-ES draw
    * ("best k docs per language, stochastically by quality"). One
    * window shuffle on the group key; same nano-rounded rank and
    * null/non-positive-weight exclusion as the global form. */
  def weightedTopKPerGroup(df: DataFrame, groupCols: Seq[String],
                           keyCol: String, weightCol: String, k: Int,
                           seed: Long = 0L,
                           rankCol: String = "es_rank_nano"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(groupCols.nonEmpty, "weightedTopKPerGroup needs group columns")
    requireIntegralKey(df, keyCol)
    val u = (bucketHash(col(keyCol), seed) + lit(1L)).cast("double") /
      lit(HashRange.toDouble)
    val w = col(weightCol).cast("double")
    val win = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(rankCol).desc, col(keyCol).asc)
    df.filter(w.isNotNull && w > 0.0)
      .withColumn(rankCol,
        floor(pow(u, lit(1.0) / w) * lit(1e9) + lit(0.5)).cast("long"))
      .withColumn("__rk", row_number().over(win))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** UniMax mixture plan (Chung et al. 2023, arXiv:2304.09151 §3):
    * spread `budgetTokens` as UNIFORMLY as possible across sources,
    * subject to a per-source repetition cap of `maxEpochs` epochs —
    * the anti-temperature recipe: no source is oversampled past the cap
    * to chase proportions, and the freed budget waterfalls to the rest.
    *
    * Closed-form water-filling, fully in the plan (no driver loop,
    * unlike [[mixturePlan]]'s BigInt path): sort sources by capacity
    * cap_s = n_s * maxEpochs ascending; source i is capped iff
    * cap_i * (n - i + 1) <= B - cum_{i-1} (a monotone prefix), the
    * water level is L = (B - sum of capped caps) / (#uncapped), and
    * quota_s = min(cap_s, L). All windows run over the per-source
    * aggregate frame (tens of rows) — the corpus itself is touched by
    * exactly one partial-aggregated count pass. Every arithmetic step
    * is identically-ordered IEEE double math, so the plan is
    * bit-reproducible in any engine (the DuckDB gate hash-matches).
    *
    * Returns (source, n_tokens, quota_tokens, epochs); rows with a
    * NULL source are excluded (same contract as [[mixturePlan]]). If
    * B >= sum(cap) every source is capped and the budget is NOT fully
    * spent — the cap is the point of UniMax. */
  def unimaxPlan(df: DataFrame, sourceCol: String, tokenCol: String,
                 budgetTokens: Long, maxEpochs: Double): DataFrame = {
    require(budgetTokens >= 0, s"budget must be >= 0, got $budgetTokens")
    require(maxEpochs > 0.0, s"maxEpochs must be positive, got $maxEpochs")
    val b = lit(budgetTokens.toDouble)
    // partitionBy(lit(1)): the single partition is INTENDED — this window
    // runs over the per-source aggregate (tens of rows, documented).
    // Note the constant key does NOT silence the "No Partition Defined"
    // WindowExec warning: Catalyst constant-folds foldable partition keys
    // out of the spec, so the executed window is unpartitioned again.
    // The expected warning sites are enumerated in COVERAGE.md ("WindowExec
    // warning inventory") — all post-aggregate frames, none corpus-sized.
    val one = lit(1)
    val ord = Window.partitionBy(one).orderBy(col("cap"), col("source"))
    val all = Window.partitionBy(one)
    val caps = df.where(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).as("source"))
      .agg(coalesce(sum(col(tokenCol).cast("long")), lit(0L))
        .as("n_tokens"))
      .withColumn("cap", col("n_tokens").cast("double") * lit(maxEpochs))
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__cum", sum(col("cap")).over(ord))
      .withColumn("__n", count(lit(1)).over(all))
    val remaining = b - (col("__cum") - col("cap"))
    val capped =
      col("cap") * (col("__n") - col("__rn") + 1).cast("double") <= remaining
    val k = sum(capped.cast("int")).over(all)
    val cumCapped = sum(when(capped, col("cap")).otherwise(lit(0.0)))
      .over(all)
    val level = (b - cumCapped) / (col("__n") - k).cast("double")
    val quota = when(k === col("__n"), col("cap"))
      .otherwise(when(capped, col("cap"))
        .otherwise(least(col("cap"), greatest(level, lit(0.0)))))
    caps.withColumn("quota_tokens", quota)
      .withColumn("epochs",
        when(col("n_tokens") > 0,
          col("quota_tokens") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)))
      .select(col("source"), col("n_tokens"), col("quota_tokens"),
        col("epochs"))
  }

  /** Apply a [[unimaxPlan]]: broadcast the plan, replicate each row
    * [[epochCopies]](key, epochs) times — floor(epochs) copies plus one
    * more with probability frac(epochs), so every source lands on its
    * quota in expectation and never exceeds its cap by more than the
    * fractional draw. Row-local after the broadcast join. */
  def unimaxApply(df: DataFrame, sourceCol: String, keyCol: String,
                  plan: DataFrame, seed: Long = 0L,
                  copyCol: String = "epoch_copy"): DataFrame = {
    requireIntegralKey(df, keyCol)
    val p = broadcast(plan.select(col("source").as("__um_source"),
      col("epochs").as("__um_epochs")))
    val joined = df.join(p, df(sourceCol) === col("__um_source"), "left")
      .withColumn("__um_epochs", coalesce(col("__um_epochs"), lit(0.0)))
      .drop("__um_source")
    upsampleEpochs(joined, keyCol, "__um_epochs", seed, copyCol)
      .drop("__um_epochs")
  }
}
