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
}
