package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private def ids(n: Int) =
    df("id BIGINT, source STRING",
      (1 to n).map(i => Row(i.toLong, if (i % 3 == 0) "web" else "book")): _*)

  test("bucketHash: deterministic, in range, seed changes the draw") {
    val d = ids(2000)
    val h1 = d.select(Sampling.bucketHash(col("id")).as("h")).collect()
      .map(_.getLong(0))
    val h2 = d.select(Sampling.bucketHash(col("id")).as("h")).collect()
      .map(_.getLong(0))
    assert(h1.sameElements(h2))
    assert(h1.forall(h => h >= 0 && h < Sampling.HashRange))
    val hSeeded = d.select(Sampling.bucketHash(col("id"), 7L).as("h"))
      .collect().map(_.getLong(0))
    assert(!h1.sameElements(hSeeded))
  }

  test("bucketHash: uniform over coarse buckets on sequential ids (the " +
    "adversarial input for multiplicative hashing)") {
    val d = ids(20000)
    val counts = d.select((Sampling.bucketHash(col("id")) %
        lit(20L)).as("b"))
      .groupBy("b").count().collect().map(_.getLong(1))
    assert(counts.length == 20)
    val mean = 20000.0 / 20
    counts.foreach(c =>
      assert(math.abs(c - mean) < mean * 0.2,
        s"bucket count $c deviates >20% from $mean: ${counts.toSeq}"))
  }

  test("bernoulliSample: ~fraction kept, stable under repartitioning, " +
    "disjoint from the complement") {
    val d = ids(10000)
    val kept = Sampling.bernoulliSample(d, "id", 0.3).collect()
      .map(_.getLong(0)).toSet
    assert(kept.size > 2600 && kept.size < 3400, s"got ${kept.size}")
    val keptShuffled = Sampling
      .bernoulliSample(d.repartition(7), "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(keptShuffled == kept, "sample must not depend on layout")
  }

  test("bernoulliSample: same-seed samples nest (10% subset of 30%) — " +
    "growing a sample never resamples") {
    val d = ids(10000)
    val small = Sampling.bernoulliSample(d, "id", 0.1, seed = 3L)
      .collect().map(_.getLong(0)).toSet
    val big = Sampling.bernoulliSample(d, "id", 0.3, seed = 3L)
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big),
      s"${(small -- big).size} rows left the sample when it grew")
  }

  test("hashSplitTag: test/train partition the keys at ~testFraction") {
    val d = ids(10000)
    val tagged = Sampling.hashSplitTag(d, "id", 0.2, seed = 5L)
    val test = tagged.filter(col("is_test")).count()
    val train = tagged.filter(!col("is_test")).count()
    assert(test + train == 10000)
    assert(test > 1700 && test < 2300, s"got $test")
  }

  test("stratifiedExactN: exactly n per stratum, deterministic") {
    val d = ids(3000)
    val out = Sampling.stratifiedExactN(d, Seq("source"), "id", 50)
    val counts = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("web" -> 50L, "book" -> 50L))
    val again = Sampling.stratifiedExactN(d, Seq("source"), "id", 50)
      .collect().map(_.getLong(0)).toSet
    assert(again == out.collect().map(_.getLong(0)).toSet)
  }

  test("weightedSample: acceptance tracks the per-row weight, " +
    "w=1 keeps, w=0 and null drop") {
    val d = df("id BIGINT, w DOUBLE",
      ((1 to 4000).map(i => Row(i.toLong, 0.25)) ++
       (4001 to 5000).map(i => Row(i.toLong, 1.0)) ++
       (5001 to 6000).map(i => Row(i.toLong, 0.0)) ++
       (6001 to 6100).map(i => Row(i.toLong, null))): _*)
    val kept = Sampling.weightedSample(d, "id", "w")
      .groupBy(col("w")).count().collect()
      .map(r => (if (r.isNullAt(0)) -1.0 else r.getDouble(0)) ->
        r.getLong(1)).toMap
    assert(kept(1.0) == 1000L)
    assert(kept.getOrElse(0.0, 0L) == 0L && kept.getOrElse(-1.0, 0L) == 0L)
    assert(kept(0.25) > 850 && kept(0.25) < 1150, s"got ${kept(0.25)}")
  }

  test("hashSplit3Tag: exhaustive disjoint splits at ~the fractions, " +
    "consistent with the 2-way tag at the same seed") {
    val d = ids(10000)
    val tagged = Sampling.hashSplit3Tag(d, "id", 0.1, 0.2, seed = 11L)
    val counts = tagged.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000L)
    assert(counts("test") > 800 && counts("test") < 1200)
    assert(counts("val") > 1700 && counts("val") < 2300)
    // the 3-way 'test' range IS the 2-way test split (same hash draw)
    val twoWay = Sampling.hashSplitTag(d, "id", 0.1, seed = 11L)
      .filter(col("is_test")).collect().map(_.getLong(0)).toSet
    val threeWay = tagged.filter(col("split") === "test")
      .collect().map(_.getLong(0)).toSet
    assert(twoWay == threeWay)
  }

  test("upsampleEpochs: copies = floor(w) + Bernoulli(frac(w)), " +
    "expectation ~w, copy index 1..n, zero-weight rows vanish") {
    val d = df("id BIGINT, w DOUBLE",
      ((1 to 2000).map(i => Row(i.toLong, 2.5)) ++
       (2001 to 2100).map(i => Row(i.toLong, 0.0)) ++
       (2101 to 2200).map(i => Row(i.toLong, 1.0))): _*)
    val up = Sampling.upsampleEpochs(d, "id", "w")
    val perDoc = up.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((2101L to 2200L).forall(perDoc(_) == 1L))
    assert((2001L to 2100L).forall(!perDoc.contains(_)))
    val w25 = (1L to 2000L).map(perDoc(_))
    assert(w25.forall(c => c == 2L || c == 3L))
    val meanCopies = w25.sum.toDouble / w25.size
    assert(meanCopies > 2.4 && meanCopies < 2.6, s"mean $meanCopies")
    // copy index runs 1..n per doc
    val maxIdx = up.filter(col("id") === 1L)
      .agg(max(col("epoch_copy")), count(lit(1))).collect()(0)
    assert(maxIdx.getLong(0) == maxIdx.getLong(1))
    // matches the SQL-checkable copy-count column
    val audited = d.select(col("id"),
        Sampling.epochCopies(col("id"), col("w")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    perDoc.foreach { case (id, n) => assert(audited(id) == n) }
  }

  test("non-integral key columns fail fast instead of silently " +
    "sampling nothing") {
    val d = df("name STRING, source STRING", Row("a", "web"))
    val e = intercept[IllegalArgumentException] {
      Sampling.bernoulliSample(d, "name", 0.5)
    }
    assert(e.getMessage.contains("integral"))
    intercept[IllegalArgumentException] {
      Sampling.hashSplit3Tag(d, "name", 0.1, 0.2)
    }
  }

  test("bucketHash: negative keys agree with the sign-of-dividend SQL " +
    "twin (positive-mod form), stay in range") {
    // DuckDB/PostgreSQL `%` keeps the dividend's sign; the documented SQL
    // twin (SparkEntry.HashSql) wraps it as (x % m + m) % m. Scala's `%`
    // has the same sign-of-dividend semantics, so this models the oracle
    // engine exactly.
    def sqlTwin(key: Long, seed: Long): Long = {
      val m = 2147483648L
      var x = ((key + seed) % m + m) % m
      for (c <- Seq(2654435761L, 2246822519L, 3266489917L)) {
        x = ((x * c) / 8192L) % m
        x ^= x / 65536L
      }
      x / 2048L
    }
    val keys = Seq(-1L, -42L, -2147483648L, -9999999999L, 0L, 1L,
      2147483647L, 9999999999L)
    val d = df("id BIGINT", keys.map(Row(_)): _*)
    for (seed <- Seq(0L, 7L)) {
      val spark = d.select(col("id"),
          Sampling.bucketHash(col("id"), seed).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      keys.foreach { k =>
        assert(spark(k) == sqlTwin(k, seed),
          s"key $k seed $seed: spark ${spark(k)} != sql ${sqlTwin(k, seed)}")
        assert(spark(k) >= 0 && spark(k) < Sampling.HashRange)
      }
    }
  }

  test("bucketHash avalanche: no striping over consecutive keys (a " +
    "fraction-0.5 keep-set looks iid, not contiguous runs)") {
    // The single-multiplicative-round ancestor produced arithmetic-
    // progression draws: keep decisions over consecutive ids came in
    // stripes of ~13 (about 770 runs over 10k ids). IID Bernoulli(0.5)
    // gives ~5000 runs (sd ~50). Guard the avalanche property.
    val d = spark.range(10000).select(col("id"))
    val thr = Sampling.threshold(0.5)
    val keeps = d.select(col("id"),
        (Sampling.bucketHash(col("id"), 0L) < thr).as("keep"))
      .orderBy("id").collect().map(_.getBoolean(1))
    val runs = 1 + keeps.sliding(2).count(p => p(0) != p(1))
    assert(runs > 4500 && runs < 5500, s"runs=$runs")
    val kept = keeps.count(identity)
    assert(kept > 4800 && kept < 5200, s"kept=$kept")
  }

  test("stringKey31 equals the documented code-point fold (incl. " +
    "non-ASCII BMP), empty -> 0, null -> null") {
    def ref(w: String): Long =
      w.foldLeft(0L)((h, ch) => (h * 31 + ch.toInt) % 2147483648L)
    val words = Seq("hello", "the", "a", "", "zebra-striped", "é", "中文")
    val d = df("w STRING", (words.map(Row(_)) :+ Row(null)): _*)
    val got = d.select(col("w"), Sampling.stringKey31(col("w")).as("h"))
      .collect().map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    words.foreach(w => assert(got(Some(w)) == Some(ref(w)), s"word=$w"))
    assert(got(None).isEmpty)
  }

  test("mixSources: per-source rates (0 drops, 1 keeps all)") {
    val d = ids(3000) // 1000 web, 2000 book
    val mixed = Sampling.mixSources(d, "source",
      Map("web" -> 1.0, "book" -> 0.25), "id")
    val counts = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("web") == 1000L)
    assert(counts("book") > 400L && counts("book") < 600L)
    // unlisted sources default to rate 0
    val none = Sampling.mixSources(d, "source", Map("web" -> 0.0), "id")
    assert(none.count() == 0L)
  }

  private def docs(rows: (Long, String, Long)*) =
    df("id BIGINT, source STRING, toks BIGINT",
      rows.map(r => Row(r._1, r._2, r._3)): _*)

  test("mixturePlan alpha=0.5: hand-computed sqrt-temperature rates") {
    // A: 100 tokens, B: 400 -> s = (10e6, 20e6), weights (1/3, 2/3);
    // budget 250 -> rate_A = 250/3/100 = 0.8333(3) -> 833333 (rounds
    // down), rate_B = 250*2/3/400 = 0.41666(7) -> 416667 (rounds up)
    val plan = Sampling.mixturePlan(
        docs((1L, "A", 100L), (2L, "B", 400L)),
        "source", "toks", budgetTokens = 250L, alpha = 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(plan == Map("A" -> 833333L, "B" -> 416667L))
  }

  test("mixturePlan excludes NULL sources (documented contract) instead " +
    "of NPEing on the driver sort") {
    val plan = Sampling.mixturePlan(
        docs((1L, "A", 100L), (2L, null, 999L), (3L, "B", 400L)),
        "source", "toks", budgetTokens = 250L, alpha = 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // identical to the two-source plan: the null-source row is excluded
    assert(plan == Map("A" -> 833333L, "B" -> 416667L))
  }

  test("mixturePlan alpha=1: natural proportions give one uniform rate") {
    val plan = Sampling.mixturePlan(
        docs((1L, "A", 100L), (2L, "B", 400L)),
        "source", "toks", budgetTokens = 250L, alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // every source keeps budget/total = 250/500 = 0.5 epochs
    assert(plan == Map("A" -> 500000L, "B" -> 500000L))
  }

  test("mixturePlan: maxEpochs caps a tiny source's upsampling") {
    val plan = Sampling.mixturePlan(
        docs((1L, "A", 10L), (2L, "B", 1000L)),
        "source", "toks", budgetTokens = 2000L, alpha = 0.5,
        maxEpochs = 2.0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(plan("A") == 2000000L) // uncapped would be ~18 epochs
    assert(plan("B") < 2000000L && plan("B") > 0L)
  }

  test("mixturePlan: zero-token source gets rate 0; token sums per " +
    "source are reported") {
    val plan = Sampling.mixturePlan(
        docs((1L, "A", 0L), (2L, "B", 100L), (3L, "B", 200L)),
        "source", "toks", budgetTokens = 100L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(plan("A") == ((0L, 0L)))
    assert(plan("B")._1 == 300L && plan("B")._2 > 0L)
  }

  test("applyMixture: copies match epochCopies, reruns identical, " +
    "absent source drops") {
    val d = df("id BIGINT, source STRING, toks BIGINT",
      (1 to 200).map(i =>
        Row(i.toLong, if (i % 2 == 0) "A" else "ghost", 10L)): _*)
    val plan = docs().sparkSession.createDataFrame(
      java.util.List.of(Row("A", 1000L, 2500000L)),
      org.apache.spark.sql.types.StructType.fromDDL(
        "source STRING, n_tokens BIGINT, rate_micro BIGINT"))
    val out = Sampling.applyMixture(d, "source", "id", plan, seed = 3L)
    val counts = out.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ghost rows vanish; A rows appear 2 or 3 times, expectation 2.5
    assert(counts.keys.forall(_ % 2 == 0))
    assert(counts.values.forall(c => c == 2L || c == 3L))
    val total = counts.values.sum.toDouble / counts.size
    assert(total > 2.3 && total < 2.7)
    val again = Sampling.applyMixture(d, "source", "id", plan, seed = 3L)
      .groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }

  // --- weightedTopK (Efraimidis-Spirakis) ---

  test("weightedTopK: deterministic, k rows, excludes null/zero/negative " +
    "weights, and a huge weight always wins") {
    val d = df("id BIGINT, w DOUBLE",
      ((1L to 50L).map(i => Row(i, 1.0)) ++
        Seq(Row(100L, 1e9), Row(101L, null), Row(102L, 0.0),
          Row(103L, -2.0))): _*)
    val top = Sampling.weightedTopK(d, "id", "w", k = 10, seed = 7L)
      .collect().map(_.getLong(0)).toSet
    assert(top.size == 10)
    // weight 1e9 -> rank u^(1e-9) ~ 1: essentially guaranteed first
    assert(top.contains(100L))
    assert(!top.contains(101L) && !top.contains(102L) && !top.contains(103L))
    val again = Sampling.weightedTopK(d, "id", "w", k = 10, seed = 7L)
      .collect().map(_.getLong(0)).toSet
    assert(again == top)
  }

  test("weightedTopK: equal weights reduce to rank by hash draw " +
    "(the unweighted deterministic sample)") {
    val d = df("id BIGINT, w DOUBLE", (1L to 100L).map(Row(_, 3.0)): _*)
    val top = Sampling.weightedTopK(d, "id", "w", k = 5, seed = 1L)
      .collect().map(_.getLong(0)).toSet
    // same ordering as u alone: u^(1/3) is monotone in u
    val byHash = d.select(col("id"),
        Sampling.bucketHash(col("id"), 1L).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = byHash.sortBy { case (id, h) => (-h, id) }
      .take(5).map(_._1).toSet
    assert(top == expected)
  }

  test("weightedTopK inclusion frequency tracks weight (2:1 over seeds)") {
    val d = df("id BIGINT, w DOUBLE",
      (1L to 40L).map(i => Row(i, if (i <= 20) 2.0 else 1.0)): _*)
    val hits = (0L until 40L).flatMap(s =>
      Sampling.weightedTopK(d, "id", "w", k = 8, seed = s)
        .collect().map(_.getLong(0)))
    val heavy = hits.count(_ <= 20).toDouble
    val light = hits.count(_ > 20).toDouble
    assert(heavy / light > 1.4, s"heavy=$heavy light=$light")
  }

  test("weightedTopKPerGroup: k per group, each group's selection " +
    "equals the global operator restricted to that group") {
    val d = df("id BIGINT, g STRING, w DOUBLE",
      (1L to 60L).map(i =>
        Row(i, if (i % 2 == 0) "a" else "b", (i % 7 + 1).toDouble)): _*)
    val per = Sampling.weightedTopKPerGroup(d, Seq("g"), "id", "w",
        k = 5, seed = 3L)
      .collect().map(r => r.getString(1) -> r.getLong(0))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(per("a").size == 5 && per("b").size == 5)
    for (g <- Seq("a", "b")) {
      val global = Sampling.weightedTopK(d.filter(col("g") === g), "id",
          "w", k = 5, seed = 3L)
        .collect().map(_.getLong(0)).toSet
      assert(per(g) == global, s"group $g")
    }
  }

  // --- unimaxPlan / unimaxApply ---

  private def langDocs() = df("id BIGINT, lang STRING, toks BIGINT",
    ((1L to 10L).map(i => Row(i, "en", 100L)) ++
      (11L to 14L).map(i => Row(i, "de", 50L)) ++
      (15L to 16L).map(i => Row(i, "fr", 25L))): _*)
  // totals: en 1000, de 200, fr 50

  test("unimaxPlan: partial capping waterfalls freed budget (hand case)") {
    // caps at 2 epochs: en 2000, de 400, fr 100; budget 900:
    // sorted fr(100), de(400), en(2000); fr: 100*3=300<=900 capped;
    // de: 400*2=800 <= 800 capped; en: L=(900-500)/1=400 -> quota 400
    val p = Sampling.unimaxPlan(langDocs(), "lang", "toks",
        budgetTokens = 900L, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(p("fr") == ((50L, 100.0, 2.0)))
    assert(p("de") == ((200L, 400.0, 2.0)))
    assert(p("en")._2 == 400.0 && approx(p("en")._3, 0.4))
    // budget exactly spent
    assert(p.values.map(_._2).sum == 900.0)
  }

  test("unimaxPlan: budget above total capacity caps every source " +
    "(spend < budget, the UniMax point)") {
    val p = Sampling.unimaxPlan(langDocs(), "lang", "toks",
        budgetTokens = 10000L, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(p == Map("en" -> 2000.0, "de" -> 400.0, "fr" -> 100.0))
  }

  test("unimaxPlan: no capping gives an equal split") {
    val p = Sampling.unimaxPlan(langDocs(), "lang", "toks",
        budgetTokens = 150L, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(p.values.forall(_ == 50.0))
  }

  test("unimaxApply: per-source realized copies approximate the quota " +
    "and reruns are identical") {
    val plan = Sampling.unimaxPlan(langDocs(), "lang", "toks",
      budgetTokens = 900L, maxEpochs = 2.0)
    val out = Sampling.unimaxApply(langDocs(), "lang", "id", plan,
      seed = 11L)
    val toks = out.groupBy("lang").agg(sum("toks").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // fr, de at exactly 2 epochs (integer): exact
    assert(toks("fr") == 100L && toks("de") == 400L)
    // en at 0.4 epochs: stochastic rounding around 400
    assert(toks("en") >= 200L && toks("en") <= 600L)
    val again = Sampling.unimaxApply(langDocs(), "lang", "id", plan,
        seed = 11L)
      .groupBy("lang").agg(sum("toks").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == toks)
  }
}
