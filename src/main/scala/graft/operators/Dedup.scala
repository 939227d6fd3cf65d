package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document deduplication operators for training-data pipelines:
  * exact (hash), n-gram Jaccard, MinHash+LSH banding, SimHash, and
  * embedding-cosine near-dup. Each returns either the surviving rows or the
  * duplicate-pair table, so pipelines can audit before dropping.
  *
  * Scale design: exact dedup is one hash-shuffle; MinHash/SimHash are
  * linear scans + a band-bucket shuffle (candidate pairs only inside a
  * bucket — never the O(n^2) cross join); plain Jaccard is reserved for
  * verifying candidate pairs, not generating them.
  */
object Dedup {

  /** Exact dedup on a canonical text hash: keeps the row with the smallest
    * `idCol` per hash group (deterministic winner). One shuffle. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact-duplicate group table: md5 -> group size + canonical id.
    * SQL-expressible (oracle-checkable) face of [[exact]]. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String)
      : DataFrame =
    df.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  /** Word-shingle sets: distinct n-grams of tokens per doc (the unit for
    * Jaccard/MinHash). n=1 gives bag-of-words.
    *
    * n >= 2 runs the native codegen'd kernel
    * [[graft.plans.ShinglesExpr]] — one sliding-window while-loop per row
    * with a LinkedHashSet for first-occurrence distinct order, bit-equal
    * to the interpreted twin [[shinglesHof]] (DedupSpec). Docs shorter
    * than n tokens yield an empty set; so does a null doc. */
  def shingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val toks = TextFunctions.tokens(lower(text))
    // n=1 coalesces to empty on null text so every width shares one
    // contract: a null doc has an empty shingle set, never null
    if (n == 1)
      coalesce(array_distinct(toks), array().cast("array<string>"))
    else GraftColumnBridge.column(graft.plans.ShinglesExpr(
      GraftColumnBridge.expression(toks), n))
  }

  /** Interpreted higher-order twin of [[shingles]] (n >= 2), kept for
    * differential verification of the native kernel (DedupSpec asserts
    * exact equality). The token array is BOUND once via a 1-element
    * `transform` (lambda variables are materialized values): referencing
    * the split expression directly inside the index lambda would re-run
    * the regex tokenization once per shingle (measured 40x slower). */
  private[graft] def shinglesHof(text: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(lower(text))
    val perDoc = transform(array(toks), t =>
      when(size(t) >= n,
        array_distinct(transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", slice(t, i + 1, lit(n))))))
        .otherwise(array().cast("array<string>")))
    element_at(perDoc, 1)
  }

  /** n-gram Jaccard near-dup pairs >= threshold — EXACT, with prefix
    * filtering (the PPJoin candidate-pruning principle): under ANY fixed
    * global order of the shingle universe, a pair with Jaccard >= t must
    * share one of the first |A| - ceil(t*|A|) + 1 shingles of each set.
    * The order used is CORPUS DOCUMENT FREQUENCY ascending (rarest
    * first, hash then binary-string tie-break for a deterministic
    * total order) — the canonical PPJoin choice: the prefix then holds
    * each doc's rarest shingles, so a hot shingle ("in the") that lands
    * in millions of documents almost never lands in a prefix, and the
    * prefix self-join stays near the PPJoin candidate bound. Costs one
    * extra partial-aggregated shuffle (the frequency count) plus a
    * frequency join and per-doc window vs a row-local hash-order
    * prefix — the right trade at corpus scale, where hash order lets a
    * single hot shingle inflate candidates quadratically. A size-ratio
    * prune (t <= |A|/|B| <= 1/t) cuts further; candidates are verified
    * exactly on the full sets. Results are identical to the naive
    * all-pairs shingle join; only candidate generation changes.
    *
    * Shuffles: frequency agg + join, per-doc prefix window, prefix
    * self-join, candidate distinct, two verify joins.
    *
    * Cache lifetime: the internal shingle frame is persisted
    * (MEMORY_AND_DISK) and OUTLIVES this call — the lazy result still
    * references it. Long-lived sessions should clear caches between
    * runs (`spark.sharedState.cacheManager.clearCache()`, the
    * Verify/Bench convention).
    *
    * `blockCols`: optional equality blocking (e.g. `source`) — pairs must
    * agree on these columns. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double,
                   blockCols: Seq[String] = Nil): DataFrame = {
    // persisted: feeds candidate generation and both verification joins —
    // without persistence the regex shingling re-runs in each branch
    val sh = df.select((col(idCol).as("id") +: blockCols.map(col)) :+
        shingles(col(textCol), n).as("sh"): _*)
      .withColumn("sh_size", size(col("sh")))
      .filter(col("sh_size") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = jaccardCandidates(sh, threshold, blockCols,
      rarityOrder = true)
    // exact verification on the full sets
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b")))
        .cast("double"))
      .withColumn("jaccard", col("inter") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** PPJoin candidate generation over a prepared `(id, [blockCols], sh,
    * sh_size)` frame. `rarityOrder = true` ranks the shingle universe by
    * ascending corpus document frequency (the production path);
    * `rarityOrder = false` uses raw xxhash64 order — kept ONLY so the
    * differential spec can demonstrate the candidate-count gap on a
    * skewed corpus. Both orders are deterministic total orders, so both
    * are CORRECT prefixes (verification is exact either way); rarity
    * order just generates fewer candidates when shingle frequency is
    * skewed. */
  private[graft] def jaccardCandidates(sh: DataFrame, threshold: Double,
                                       blockCols: Seq[String],
                                       rarityOrder: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = sh.select((col("id") +: col("sh_size") +:
      blockCols.map(col)) :+ explode(col("sh")).as("shingle"): _*)
    // document frequency of each shingle over the (filtered) corpus, as
    // a count window over ONE exchange on the shingle key — the former
    // groupBy + join-back derived the exploded frame twice and paid a
    // second shuffle for identical __df values (r20); skew exposure is
    // unchanged (the join shuffled ex by the same key)
    val ranked =
      if (rarityOrder)
        ex.withColumn("__df", count(lit(1)).over(
          Window.partitionBy(col("shingle"))))
      else ex.withColumn("__df", lit(0L))
    // per-doc prefix of length |A| - ceil(t|A|) + 1 under the global
    // (df, hash, shingle) order; the window partitions by doc id, so no
    // partition exceeds one document's shingle count
    val w = Window.partitionBy(col("id"))
      .orderBy(col("__df"), xxhash64(col("shingle")), col("shingle"))
    // persisted: the prefix index is referenced by BOTH self-join sides —
    // without the barrier the explode + df-count + per-doc window subplan
    // executes once per side (r20: that was 2 full window sorts of the
    // exploded corpus per candidate pass). Footprint is the PPJoin prefix
    // mass, ~(1-t) of the shingle mass the caller already persists as
    // `sh`. Same cache lifetime as sh (see jaccardPairs).
    val prefix = ranked
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= greatest(
        (col("sh_size") - ceil(lit(threshold) * col("sh_size")) + 1L)
          .cast("long"), lit(1L)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keep = (col("id") +: col("sh_size") +: col("__rk") +:
      blockCols.map(col)) :+ col("shingle")
    val a = prefix.select(keep: _*)
      .toDF(("id_a" +: "size_a" +: "__rka" +:
        blockCols.map(_ + "_a")) :+ "shingle": _*)
    val b = prefix.select(keep: _*)
      .toDF(("id_b" +: "size_b" +: "__rkb" +:
        blockCols.map(_ + "_b")) :+ "shingle": _*)
    val blockEq = blockCols.map(c => col(c + "_a") === col(c + "_b"))
      .foldLeft(lit(true))(_ && _)
    // positional filter (PPJoin): let w be the pair's minimal shared
    // prefix shingle under the global (df, hash, shingle) order. Any
    // common shingle BELOW w would sit even earlier in both docs'
    // orders, hence inside both prefixes, contradicting w's minimality —
    // so every common shingle is >= w and |A∩B| <= 1 + min(|A|-pos_w(A),
    // |B|-pos_w(B)). Per-doc ranks are order-consistent, so min(__rka)
    // and min(__rkb) over the pair's matched rows BOTH come from w —
    // one groupBy (replacing the distinct, same shuffle) yields the
    // bound, and pairs that cannot reach t/(1+t)·(|A|+|B|) common
    // shingles never enter the exact-verification joins
    a.join(b, Seq("shingle"))
      .where(col("id_a") < col("id_b") && blockEq &&
        col("size_a") * threshold <= col("size_b") &&
        col("size_b") * threshold <= col("size_a"))
      .groupBy("id_a", "id_b")
      .agg(min(col("size_a")).as("size_a"), min(col("size_b")).as("size_b"),
        min(col("__rka")).as("__rka"), min(col("__rkb")).as("__rkb"))
      .where((lit(1L) + least(col("size_a") - col("__rka"),
          col("size_b") - col("__rkb"))).cast("double") >=
        lit(threshold / (1.0 + threshold)) *
          (col("size_a") + col("size_b")).cast("double") - lit(1e-9))
      .select("id_a", "id_b")
  }

  /** n-gram CONTAINMENT pairs: c(A,B) = |A∩B| / |A| >= threshold — the
    * doc-in-doc detector for partial duplication (a page quoting another
    * wholesale, boilerplate-wrapped copies) that symmetric Jaccard
    * misses: a short doc fully contained in a long one has low Jaccard
    * but containment 1. Output rows are DIRECTED: id_a is the contained
    * document, id_b the container (both directions emitted when both
    * clear the threshold).
    *
    * Candidate pruning is necessarily asymmetric: the contained side
    * keeps a |A| - ceil(t|A|) + 1 prefix under the corpus
    * document-frequency order (rarest shingles first, as in
    * [[jaccardPairs]] — a pair with |A∩B| >= t|A| must hit the prefix
    * under ANY fixed global order, and rarity order makes each prefix
    * shingle's posting list in the container index as short as
    * possible), but the container side has NO size-based prefix — a B
    * of any size can contain all of A — so B's shingles are indexed in
    * full (the inverted-index build, linear in corpus tokens, same as
    * tfIdf; its explode doubles as the frequency count input). A size
    * prune |B| >= ceil(t|A|) cuts the rest. Verified exactly on the
    * full sets; results identical to the naive all-pairs join.
    *
    * Cache lifetime: as [[jaccardPairs]] — the persisted shingle frame
    * outlives the call; clear session caches between runs. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int, threshold: Double,
                       blockCols: Seq[String] = Nil): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    import org.apache.spark.sql.expressions.Window
    // persisted: feeds candidate generation and both verification joins
    val sh = df.select((col(idCol).as("id") +: blockCols.map(col)) :+
        shingles(col(textCol), n).as("sh"): _*)
      .withColumn("sh_size", size(col("sh")))
      .filter(col("sh_size") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = {
      val ex = sh.select((col("id") +: col("sh_size") +:
        blockCols.map(col)) :+ explode(col("sh")).as("shingle"): _*)
      val w = Window.partitionBy(col("id"))
        .orderBy(col("__df"), xxhash64(col("shingle")), col("shingle"))
      // document frequency as a count window over one shingle exchange
      // (same rewrite as jaccardCandidates, r20) — the container side
      // below keeps reading the plain exploded frame
      val a = ex
        .withColumn("__df", count(lit(1)).over(
          Window.partitionBy(col("shingle"))))
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= greatest(
          (col("sh_size") - ceil(lit(threshold) * col("sh_size")) + 1L)
            .cast("long"), lit(1L)))
        .select((col("id") +: col("sh_size") +: blockCols.map(col)) :+
          col("shingle"): _*)
        .toDF(("id_a" +: "size_a" +: blockCols.map(_ + "_a")) :+
          "shingle": _*)
      val b = ex
        .toDF(("id_b" +: "size_b" +: blockCols.map(_ + "_b")) :+
          "shingle": _*)
      val blockEq = blockCols.map(c => col(c + "_a") === col(c + "_b"))
        .foldLeft(lit(true))(_ && _)
      a.join(b, Seq("shingle"))
        .where(col("id_a") =!= col("id_b") && blockEq &&
          col("size_b") >= ceil(lit(threshold) * col("size_a")))
        .select("id_a", "id_b").distinct()
    }
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("containment",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(col("sh_a")))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "containment")
  }

  /** MinHash signatures: k independent permutation approximations;
    * signature[i] = min over shingles of xxhash64(seed_i, h(shingle)).
    * Computed by the native codegen'd kernel
    * [[graft.plans.MinHashSigExpr]] — one primitive while-loop per row,
    * zero per-shingle allocations, no interpreted-lambda seam (round 5;
    * bit-equal to the HOF twin below by DedupSpec). Empty shingle sets
    * yield all-null signatures. Linear scan, no shuffle. */
  def minHashSignature(text: Column, n: Int, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.plans.MinHashSigExpr(
        GraftColumnBridge.expression(shingles(text, n)), k))
      .as("minhash_sig")
  }

  /** Interpreted higher-order twin of [[minHashSignature]], kept for
    * differential verification of the native expression (DedupSpec
    * asserts bit equality). ONE aggregate pass carries all k running
    * minimums in an array accumulator — but every fold step still
    * allocates a k-element array per shingle, which is why the native
    * kernel replaced it in the hot path. */
  private[graft] def minHashSignatureHof(text: Column, n: Int,
                                         k: Int): Column = {
    val hashes = transform(shingles(text, n), s => xxhash64(s))
    val init = array((0 until k).map(_ => lit(Long.MaxValue)): _*)
    aggregate(hashes, init,
      (acc, h) => array((0 until k).map { i =>
        least(element_at(acc, i + 1), xxhash64(lit(i), h))
      }: _*),
      acc => transform(acc, v =>
        when(v === Long.MaxValue, lit(null).cast("long")).otherwise(v)))
      .as("minhash_sig")
  }

  /** PORTABLE face of [[minHashSignature]]: slot i carries min over
    * shingles of `mix31(stringKey31(shingle), seed + i*1000003)` — every
    * draw is plain BIGINT arithmetic ([[Sampling.mix31]] /
    * [[Sampling.stringKey31]]), reproducible bit-for-bit in any SQL
    * engine, which is what lets the MinHash gates run under the DuckDB
    * oracle (the xxhash64 face stays the production backend: stronger
    * hash, no per-character fold). Same native-kernel shape
    * ([[graft.plans.MinHashSigPortableExpr]]); DedupSpec pins bit
    * equality against the interpreted Column twin below. */
  def minHashSignaturePortable(text: Column, n: Int, k: Int,
                               seed: Long = 0L): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.plans.MinHashSigPortableExpr(
        GraftColumnBridge.expression(shingles(text, n)), k, seed))
      .as("minhash_sig")
  }

  /** Interpreted Column twin of [[minHashSignaturePortable]], built
    * from the SAME [[Sampling.mix31]]/[[Sampling.stringKey31]] Column
    * forms the SQL oracle twins mirror — the differential link between
    * the native kernel and the DuckDB gate. */
  private[graft] def minHashSignaturePortableHof(text: Column, n: Int,
      k: Int, seed: Long = 0L): Column = {
    val keys = transform(shingles(text, n), s => Sampling.stringKey31(s))
    val init = array((0 until k).map(_ => lit(Long.MaxValue)): _*)
    aggregate(keys, init,
      (acc, key) => array((0 until k).map { i =>
        least(element_at(acc, i + 1),
          Sampling.mix31(key, lit(seed + i * 1000003L)))
      }: _*),
      acc => transform(acc, v =>
        when(v === Long.MaxValue, lit(null).cast("long")).otherwise(v)))
      .as("minhash_sig")
  }

  /** MinHash + LSH banding: docs whose signature agrees on ALL rows of any
    * band land in the same bucket -> candidate pairs. bands*rowsPerBand = k.
    * Returns candidate pairs with their estimated Jaccard (signature
    * agreement rate). The only shuffle is the band-bucket groupBy.
    */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
                      maxBucket: Int = 4096): DataFrame = {
    val k = bands * rowsPerBand
    // persisted materialization barrier: without it Catalyst's projection
    // collapse inlines the whole k-hash signature expression into every
    // band lambda (interpreted, no CSE) — an O(bands*k) blowup. The cache
    // also feeds BOTH sides of the bucket self-join (a stateless barrier
    // was measured 1.8x slower — each side recomputed the signatures).
    // Block lifetime: the cache outlives this call; long-lived sessions
    // should precompute signatures and use [[minHashLshPairsFromSigs]],
    // or clear via spark.sharedState.cacheManager.clearCache() as
    // Bench/Verify do between queries.
    // fanned wide before the persist: the k-hash signature kernel is the
    // heavy row-local stage, and the cached blocks inherit the fan
    // (graft.core.Par; no-op at cluster scale / on shuffled inputs)
    val sig = graft.core.Par
      .fanOut(df.select(col(idCol).as("id"),
        minHashSignature(col(textCol), n, k).as("sig")), col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    minHashLshPairsFromSigs(sig, bands, rowsPerBand, maxBucket)
  }

  /** [[minHashLshPairs]] on the PORTABLE signature/bucket backend —
    * the oracle-checkable face (same plan, same persist barrier). */
  def minHashLshPairsPortable(df: DataFrame, idCol: String,
      textCol: String, n: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      maxBucket: Int = 4096, seed: Long = 0L): DataFrame = {
    val k = bands * rowsPerBand
    val sig = graft.core.Par
      .fanOut(df.select(col(idCol).as("id"),
        minHashSignaturePortable(col(textCol), n, k, seed).as("sig")),
        col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    minHashLshPairsFromSigsPortable(sig, bands, rowsPerBand, maxBucket)
  }

  /** Standard LSH hygiene shared by the MinHash and SimHash pair
    * generators: a viral bucket of B rows yields B^2/2 candidate pairs in
    * the bucket self-join, so ONE degenerate key (all-empty boilerplate,
    * a template page repeated 10M times) turns the whole job quadratic.
    * Buckets larger than `maxBucket` are dropped from pair generation
    * entirely (overflow policy: such buckets are near-always degenerate
    * mass — near-constant content belongs to EXACT dedup, which should
    * run first; a genuine >maxBucket near-dup clique loses only the
    * pairs whose sole collision was the viral bucket). Implemented as a
    * count over the bucket-key window: ONE exchange of the (narrow)
    * banded frame on exactly the key the bucket self-join partitions on
    * next, so the join reuses that exchange instead of adding its own.
    * A viral bucket costs one spillable window partition — O(B log B),
    * never the O(B^2) self-join. (Measured alternatives at sf0.1:
    * groupBy + semi-join re-exchanges the banded frame twice; a
    * broadcast anti-join on the viral set serializes the whole plan
    * behind the count branch — both slower.) */
  private def capBuckets(banded: DataFrame, keyCols: Seq[String],
                         maxBucket: Int): DataFrame = {
    require(maxBucket > 1, s"maxBucket must be > 1, got $maxBucket")
    banded.withColumn("__bn",
        count(lit(1)).over(Window.partitionBy(keyCols.map(col): _*)))
      .filter(col("__bn") <= maxBucket)
      .drop("__bn")
  }

  /** Band-bucket pair generation over a precomputed `(id, sig)` frame —
    * the caller owns the signature frame's persistence and cleanup, so
    * long-lived pipelines can unpersist deterministically (and reuse one
    * signature pass across several band configurations).
    *
    * Degenerate-input guards (both essential at corpus scale):
    *  - all-null signatures (empty/shingle-less docs, the
    *    [[minHashSignature]] contract) are dropped BEFORE banding — they
    *    carry zero similarity evidence, yet `concat_ws` maps every
    *    all-null band slice to "", so without the filter every empty doc
    *    in the corpus lands in ONE bucket per band: 10M boilerplate-empty
    *    rows would mean O(10M^2) pairs;
    *  - buckets over `maxBucket` rows are dropped (see [[capBuckets]]
    *    for the overflow policy). */
  /** xxhash64 band-bucket key over a signature slice — the production
    * LSH bucket (shared with [[IncrementalDedup]]'s cross-frame join,
    * so an index built by one run probes against any later run). */
  private[operators] def xxBandBucket(sig: Column, b: Column,
                                      rowsPerBand: Int): Column =
    xxhash64(lit("band"), b,
      concat_ws(",", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))))

  /** PORTABLE band-bucket key: base-1000003 fold of the band's slots
    * (mix31 outputs < 2^31, so the fold stays in [0, 2^51)) through
    * [[Sampling.mix31]] with a per-band seed — BIGINT-reproducible by
    * the SQL oracle. Only valid over PORTABLE signatures. */
  private[operators] def portableBandBucket(sig: Column, b: Column,
                                            rowsPerBand: Int): Column =
    Sampling.mix31(
      aggregate(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
        lit(0L),
        (a, v) => pmod(a * lit(1000003L) + v, lit(2147483648L))),
      lit(900001L) + b)

  def minHashLshPairsFromSigs(sig: DataFrame, bands: Int, rowsPerBand: Int,
                              maxBucket: Int = 4096): DataFrame =
    lshPairsFromSigs(sig, bands, rowsPerBand, maxBucket,
      xxBandBucket(_, _, rowsPerBand))

  /** [[minHashLshPairsFromSigs]] over PORTABLE signatures
    * ([[minHashSignaturePortable]]): the band bucket is a base-1000003
    * fold of the band's slots passed through [[Sampling.mix31]] with a
    * per-band seed — plain BIGINT arithmetic end to end (slot values
    * are mix31 outputs < 2^31, so the fold never leaves [0, 2^51)),
    * reproducible by the DuckDB oracle. Same banding plan, same
    * degenerate-input guards. */
  def minHashLshPairsFromSigsPortable(sig: DataFrame, bands: Int,
      rowsPerBand: Int, maxBucket: Int = 4096): DataFrame =
    lshPairsFromSigs(sig, bands, rowsPerBand, maxBucket,
      portableBandBucket(_, _, rowsPerBand))

  private def lshPairsFromSigs(sig: DataFrame, bands: Int,
      rowsPerBand: Int, maxBucket: Int,
      bucket: (Column, Column) => Column): DataFrame = {
    val k = bands * rowsPerBand
    // a signature is all-null or all-non-null by construction, so the
    // first element decides
    val live = sig.filter(element_at(col("sig"), 1).isNotNull)
    val banded =
      live.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => bucket(col("sig"), b))).as(Seq("band", "bucket")))
    // signatures ride the self-join so the agreement rate is computed
    // in-line (re-joining them per distinct pair was measured ~1 s
    // slower at sf0.1 — two more exchanges; at larger signature widths
    // k, switch to a narrow (id, band, bucket) join + per-pair sig
    // lookups to keep k longs/row out of the big shuffle).
    // The bucket cap applies to the LEFT side only — a pair needs both
    // sides, so dropping viral buckets from one side removes all their
    // pairs, and the cap window evaluates once; the right side reuses
    // the same exchange untouched.
    val l = capBuckets(banded, Seq("band", "bucket"), maxBucket)
      .select(col("band"), col("bucket"),
        col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => (x === y).cast("int")), v => v === 1)).cast("double")
          / lit(k.toDouble)).as("est_jaccard"))
      .distinct()
  }

  /** 64-bit SimHash of the token stream: per-token xxhash64; fingerprint
    * bit j = sign of the sum over tokens of bit_j(hash)∈{-1,+1}. Near-dups
    * have small Hamming distance. Computed by the native codegen'd kernel
    * [[graft.plans.SimHash64Expr]] — one primitive while-loop per row
    * with a stack vote array, zero per-token allocations (round 5;
    * bit-equal to the HOF twin below by DedupSpec). */
  def simHash64(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val toks = TextFunctions.tokens(lower(text))
    GraftColumnBridge.column(graft.plans.SimHash64Expr(
        GraftColumnBridge.expression(toks)))
      .as("simhash64")
  }

  /** Interpreted higher-order twin of [[simHash64]], kept for
    * differential verification of the native expression (DedupSpec
    * asserts bit equality): ONE aggregate pass carrying an array of
    * 64 vote counters, assembled to a long in the finish lambda — but
    * each fold step still allocates a 64-element array per token. */
  private[graft] def simHash64Hof(text: Column): Column = {
    val toks = TextFunctions.tokens(lower(text))
    val hashes = transform(toks, t => xxhash64(t))
    val init = array((0 until 64).map(_ => lit(0L)): _*)
    val voted = aggregate(hashes, init,
      (acc, h) => array((0 until 64).map { j =>
        element_at(acc, j + 1) +
          (shiftright(h, j).bitwiseAND(1L) * 2L - 1L)
      }: _*),
      acc => (0 until 64).map { j =>
        when(element_at(acc, j + 1) > 0, shiftleft(lit(1L), j))
          .otherwise(lit(0L))
      }.reduce[Column]((a, b) => a.bitwiseOR(b)))
    voted.as("simhash64")
  }

  /** PORTABLE face of [[simHash64]]: a 62-BIT fingerprint whose
    * per-token hash is two [[Sampling.mix31]] draws over the token's
    * [[Sampling.stringKey31]] key (hi << 31 | lo) — BIGINT-reproducible
    * end to end, so the fingerprint AND the Hamming pairs derived from
    * it run under the DuckDB oracle. The chunk-blocking machinery
    * ([[simHashPairsFromSigs]]) is hash-free given a fingerprint and is
    * shared unchanged; xxhash64 stays the production backend. */
  def simHash64Portable(text: Column, seed: Long = 0L): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val toks = TextFunctions.tokens(lower(text))
    GraftColumnBridge.column(graft.plans.SimHash64PortableExpr(
        GraftColumnBridge.expression(toks), seed))
      .as("simhash62")
  }

  /** Interpreted Column twin of [[simHash64Portable]] (differential
    * link to the SQL-mirrored [[Sampling]] forms, as with the portable
    * minhash twin). */
  private[graft] def simHash64PortableHof(text: Column,
                                          seed: Long = 0L): Column = {
    val toks = TextFunctions.tokens(lower(text))
    val hs = transform(toks, t => {
      val k = Sampling.stringKey31(t)
      shiftleft(Sampling.mix31(k, lit(seed + 500009L)), 31)
        .bitwiseOR(Sampling.mix31(k, lit(seed)))
    })
    val init = array((0 until 62).map(_ => lit(0L)): _*)
    aggregate(hs, init,
      (acc, h) => array((0 until 62).map { j =>
        element_at(acc, j + 1) +
          (shiftright(h, j).bitwiseAND(1L) * 2L - 1L)
      }: _*),
      acc => (0 until 62).map { j =>
        when(element_at(acc, j + 1) > 0, shiftleft(lit(1L), j))
          .otherwise(lit(0L))
      }.reduce[Column]((a, b) => a.bitwiseOR(b)))
      .as("simhash62")
  }

  /** [[simHashPairs]] on the portable fingerprint — the
    * oracle-checkable face (same chunk blocking, guards, and cap). */
  def simHashPairsPortable(df: DataFrame, idCol: String, textCol: String,
                           maxDist: Int = 3, allowWide: Boolean = false,
                           maxBucket: Int = 4096,
                           seed: Long = 0L): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
        simHash64Portable(col(textCol), seed).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    simHashPairsFromSigs(sigs, maxDist, allowWide, maxBucket)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).as("hamming")

  /** SimHash near-dup pairs with Hamming distance <= maxDist, bucketed by
    * (maxDist+1) disjoint fingerprint bit-chunks: a pair differing in at
    * most d bits cannot touch all d+1 chunks, so it agrees exactly on at
    * least one (pigeonhole) — candidate recall is 1.0 BY CONSTRUCTION for
    * the requested distance, with no O(n^2) cross join. maxDist=3 gives
    * the classic 4x16-bit blocking.
    *
    * Scale note: bucket keys are ~64/(d+1) bits wide, so candidate volume
    * grows as d does (6-bit keys at d=10 mean 64-way buckets). At corpus
    * scale keep d <= 7 (8-bit keys), or pre-block on a coarse partition
    * (e.g. language/source) first; Manku-style rotated multi-block tables
    * are the next step beyond that. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3, allowWide: Boolean = false,
                   maxBucket: Int = 4096): DataFrame = {
    // persisted for the same projection-collapse + self-join-reuse reasons
    // as minHashLshPairs (same block-lifetime contract: precompute and use
    // [[simHashPairsFromSigs]] to own persistence in long-lived sessions)
    val sigs = df.select(col(idCol).as("id"),
        simHash64(col(textCol)).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    simHashPairsFromSigs(sigs, maxDist, allowWide, maxBucket)
  }

  /** Pair generation over a precomputed `(id, sig)` frame (see
    * [[simHashPairs]] for the guarantee). Exposed separately so recall can
    * be validated on adversarial bit patterns and so pipelines that
    * persist signatures can reuse them.
    *
    * `allowWide` gates wide distances: beyond maxDist=7 the chunk keys
    * narrow under 8 bits and candidate volume degrades toward
    * O(n^2 / 2^width) — a silent scale cliff, so it must be opted into.
    *
    * Degenerate-input guards: null fingerprints (null text) are dropped,
    * and chunk buckets over `maxBucket` rows are dropped before the
    * self-join (see [[capBuckets]] for the overflow policy) — empty
    * token streams all hash to fingerprint 0, so an unguarded corpus
    * with 10M blank docs would self-join one viral bucket per chunk. */
  def simHashPairsFromSigs(sigs: DataFrame, maxDist: Int,
                           allowWide: Boolean = false,
                           maxBucket: Int = 4096): DataFrame = {
    require(maxDist >= 0 && maxDist < 64,
      s"maxDist must be in [0, 63], got $maxDist")
    require(allowWide || 64 / (maxDist + 1) >= 8,
      s"maxDist=$maxDist narrows chunk keys to ${64 / (maxDist + 1)} bits " +
        "(< 8): candidate volume degrades toward O(n^2) at corpus scale. " +
        "Pre-block on a coarse partition or pass allowWide=true to " +
        "override deliberately.")
    val nChunks = maxDist + 1
    // chunk c covers bits [64c/n, 64(c+1)/n) — disjoint, exhaustive, sizes
    // differ by at most one bit
    val chunkKeys = (0 until nChunks).map { c =>
      val lo = 64 * c / nChunks
      val width = 64 * (c + 1) / nChunks - lo
      if (width >= 64) col("sig")
      else shiftright(col("sig"), lo).bitwiseAND((1L << width) - 1L)
    }
    val chunked = sigs.filter(col("sig").isNotNull)
      .select(col("id"), col("sig"),
        posexplode(array(chunkKeys: _*)).as(Seq("chunk", "key")))
    // left-side-only cap, as in minHashLshPairsFromSigs: one window
    // evaluation, same pair set (a viral bucket's pairs all need the
    // capped side)
    val l = capBuckets(chunked, Seq("chunk", "key"), maxBucket)
      .select(col("chunk"), col("key"), col("id").as("id_a"),
        col("sig").as("sig_a"))
    val r = chunked.select(col("chunk"), col("key"), col("id").as("id_b"),
      col("sig").as("sig_b"))
    l.join(r, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** Non-overlapping fixed-`k`-token segmentation of a document — the
    * dedup unit for corpus-level repetition removal when the corpus has
    * no natural line structure (the C4 unit is the line / 3-sentence
    * span; reference's line-structured analog: LOBSTER rows). The last
    * segment may be shorter. Null/empty text yields an empty array. */
  def tokenSegments(text: Column, k: Int): Column = {
    require(k > 0, s"segment width must be positive, got $k")
    val toks = TextFunctions.tokens(text)
    when(coalesce(size(toks), lit(0)) > 0,
      transform(sequence(lit(0), floor((size(toks) - 1) / k).cast("int")),
        i => concat_ws(" ", slice(toks, i * k + 1, lit(k)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Corpus-level repeated-segment removal (the C4 "discard any line
    * that appears more than once" rule, generalized to any segment
    * expression): a segment whose corpus-wide occurrence count reaches
    * `minCopies` is dropped from EVERY document — or, with
    * `keepFirst=true`, from every document except the deterministic
    * first occurrence (smallest (id, position)). Documents are
    * reassembled in original segment order; a fully-boilerplate doc
    * survives with empty `cleaned` text so the caller decides whether
    * to drop it.
    *
    * Output = input columns + `cleaned`, `n_segments`, `n_kept`.
    *
    * Scale: one partial-aggregating groupBy(segment) for corpus counts
    * (map-side combine absorbs boilerplate skew — a segment repeated
    * 100M times arrives at its reducer as per-partition subtotals, never
    * 100M rows), one shuffle join of segments against their stats, one
    * reassembly groupBy(id). No window over the corpus, nothing on the
    * driver. */
  def dropRepeatedSegments(df: DataFrame, idCol: String, segs: Column,
                           minCopies: Int = 2, keepFirst: Boolean = false,
                           joiner: String = " "): DataFrame = {
    require(minCopies >= 2, s"minCopies must be >= 2, got $minCopies")
    val segRows = df.select(col(idCol).as("__sd_id"), segs.as("__segs"))
      .select(col("__sd_id"), posexplode(col("__segs")).as(Seq("pos", "seg")))
    val stats = segRows.groupBy("seg").agg(
      count(lit(1)).as("__cnt"),
      min(struct(col("__sd_id"), col("pos"))).as("__first"))
    val isFirst = struct(col("__sd_id"), col("pos")) === col("__first")
    val keepCond =
      if (keepFirst) col("__cnt") < minCopies || isFirst
      else col("__cnt") < minCopies
    val kept = segRows.join(stats, "seg").where(keepCond)
      .groupBy(col("__sd_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("seg")))),
          x => x.getField("seg")), joiner).as("__cleaned"),
        count(lit(1)).as("__n_kept"))
    df.withColumn("n_segments", coalesce(size(segs), lit(0)).cast("long"))
      .join(kept, df(idCol) === col("__sd_id"), "left")
      .withColumn("cleaned", coalesce(col("__cleaned"), lit("")))
      .withColumn("n_kept", coalesce(col("__n_kept"), lit(0L)))
      .drop("__sd_id", "__cleaned", "__n_kept")
  }

  /** Corpus-level repeated-SUBSTRING removal at token granularity — the
    * ExactSubstr rule of Lee et al. 2022 ("Deduplicating Training Data
    * Makes Language Models Better", /root/reference has no analog; LLM
    * extension) approximated on sliding token windows: every
    * `windowTokens`-token window (stride 1) whose corpus-wide occurrence
    * count reaches `minCopies` marks its token span in every document
    * where it occurs, and marked spans (the union of overlapping
    * windows) are cut out; the surviving tokens are reassembled in
    * order. Unlike [[dropRepeatedSegments]] (C4's fixed, non-overlapping
    * segment grid), the sliding window catches a repeated passage at ANY
    * token offset — the suffix-array result at window resolution:
    * windows are exactly the length-`windowTokens` substrings, so a
    * repeated run of m >= windowTokens tokens is fully covered by its
    * m - windowTokens + 1 repeated windows.
    *
    * Output = input columns + `cleaned`, `n_tokens`, `n_kept`. A doc
    * shorter than the window has no windows, is never marked, and
    * round-trips (token-joined — reassembly normalizes whitespace, as
    * dropRepeatedSegments does). A fully-repeated doc survives with
    * empty `cleaned` so the caller decides.
    *
    * Scale: one partial-aggregating groupBy(window) for corpus counts
    * (boilerplate skew combines map-side, as in dropRepeatedSegments),
    * one semi-join of doc windows against the repeated set, one
    * per-doc collect of marked starts (bounded by doc length), one
    * join back; the span-union cut is row-local. Per-row cost of the
    * cut is O(tokens x marked-starts) — bounded by doc length squared,
    * never corpus size; long-doc corpora should raise `windowTokens`
    * (fewer, more selective marks), the knob Lee et al. use (50). */
  def dropRepeatedWindows(df: DataFrame, idCol: String, textCol: String,
                          windowTokens: Int = 10, minCopies: Int = 2,
                          joiner: String = " "): DataFrame = {
    require(windowTokens > 0,
      s"windowTokens must be positive, got $windowTokens")
    require(minCopies >= 2, s"minCopies must be >= 2, got $minCopies")
    val L = windowTokens
    val toks = when(length(trim(col(textCol))) > 0,
        TextFunctions.tokens(col(textCol)))
      .otherwise(array().cast("array<string>"))
    val wins = df
      .select(col(idCol).as("__rw_id"), toks.as("__t"))
      .select(col("__rw_id"),
        posexplode(when(size(col("__t")) >= L,
          transform(sequence(lit(0), size(col("__t")) - L),
            i => concat_ws(" ", slice(col("__t"), i + 1, lit(L)))))
          .otherwise(array().cast("array<string>")))
          .as(Seq("start", "win")))
    val repeated = wins.groupBy("win")
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCopies)
      .select("win")
    val marked = wins.join(repeated, Seq("win"), "left_semi")
      .groupBy(col("__rw_id"))
      .agg(sort_array(collect_list(col("start"))).as("__starts"))
    // row-local span-union cut; the token array is bound ONCE via the
    // 1-element transform (each direct reference would re-run the regex
    // tokenization), null __starts (no repeated window) -> empty list
    val cut = element_at(transform(array(toks), t => {
      val starts = coalesce(col("__starts"), array().cast("array<int>"))
      val pos = when(size(t) > 0,
          filter(sequence(lit(0), size(t) - 1),
            p => !exists(starts, s => s <= p && p < s + L)))
        .otherwise(array().cast("array<int>"))
      struct(
        concat_ws(joiner, transform(pos, p => element_at(t, p + 1)))
          .as("cleaned"),
        size(t).cast("long").as("n_tokens"),
        size(pos).cast("long").as("n_kept"))
    }), 1)
    df.join(marked, df(idCol) === col("__rw_id"), "left")
      .withColumn("__cut", cut)
      .withColumn("cleaned", col("__cut.cleaned"))
      .withColumn("n_tokens", col("__cut.n_tokens"))
      .withColumn("n_kept", col("__cut.n_kept"))
      .drop("__rw_id", "__starts", "__cut")
  }

  /** Measured (b, r) operating point of the banded MinHash-LSH pair
    * generator against exact PPJoin-verified Jaccard ground truth —
    * the "tune the banding on a sample BEFORE the full-corpus run"
    * governance probe. The S-curve 1-(1-t^r)^b says what capture
    * probability the banding gives a pair AT the threshold; this
    * measures what it actually did on real data: candidates vs true
    * pairs (full outer on the canonical id_a < id_b key), confusion
    * counts, micro-rounded precision/recall, and the theoretical
    * curve value for comparison.
    *
    * By contract this runs on a SAMPLE at corpus scale: the exact side
    * is PPJoin-prefix-bounded but still quadratic in the worst case,
    * so callers pass a `bernoulliSample`d slice and read the operating
    * point off it — both generators are deterministic, so the measured
    * point is rerun-stable. One report row.
    */
  def lshOperatingPoint(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5,
                        bands: Int = 8, rowsPerBand: Int = 4,
                        maxBucket: Int = 4096, seed: Long = 0L)
      : DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val exact = jaccardPairs(df, idCol, textCol, n, threshold)
      .select(col("id_a"), col("id_b"), lit(1L).as("__t"))
    val cand = minHashLshPairsPortable(df, idCol, textCol, n, bands,
        rowsPerBand, maxBucket, seed)
      .select(col("id_a"), col("id_b"), lit(1L).as("__c"))
    val micro = (x: org.apache.spark.sql.Column) =>
      floor(x * 1e6 + 0.5).cast("long")
    exact.join(cand, Seq("id_a", "id_b"), "full_outer")
      .agg(
        coalesce(sum(col("__c")), lit(0L)).as("candidate_pairs"),
        coalesce(sum(col("__t")), lit(0L)).as("true_pairs"),
        coalesce(sum(col("__t") * col("__c")), lit(0L)).as("tp"),
        coalesce(sum(when(col("__t").isNull, col("__c"))), lit(0L))
          .as("fp"),
        coalesce(sum(when(col("__c").isNull, col("__t"))), lit(0L))
          .as("fn"))
      .withColumn("precision_micro",
        when(col("candidate_pairs") > 0,
          micro(col("tp").cast("double") / col("candidate_pairs"))))
      .withColumn("recall_micro",
        when(col("true_pairs") > 0,
          micro(col("tp").cast("double") / col("true_pairs"))))
      .withColumn("theory_capture_micro",
        lit(theoryCaptureMicro(threshold, bands, rowsPerBand)))
  }

  /** Micro-rounded S-curve capture probability 1-(1-t^r)^b at the
    * threshold — driver arithmetic shared verbatim with the SQL twin
    * (both sides interpolate THIS value, so there is no cross-engine
    * pow to diverge on). */
  def theoryCaptureMicro(threshold: Double, bands: Int,
                         rowsPerBand: Int): Long =
    math.floor((1.0 - math.pow(1.0 - math.pow(threshold, rowsPerBand),
      bands)) * 1e6 + 0.5).toLong
}
