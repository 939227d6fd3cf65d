package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationSpec extends SparkSpec {

  // corpus: good prose (some exact dups + one near-dup pair), spam, and
  // a short fragment
  private def corpus() = {
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "it runs back to the barn where it sleeps for a while in the hay " +
      "as the sun sets over the quiet farm and the evening settles in"
    val nearDup = prose.replace("quiet", "silent")
    val spam = "BUY!!! NOW!!! CLICK!!! WIN!!! FREE!!! $$$ !!!"
    // 20 genuinely distinct prose docs: disjoint-ish word draws keep
    // pairwise Jaccard far below the near-dup threshold
    val vocab = Vector("orchard", "river", "mountain", "harbor", "meadow",
      "lantern", "willow", "garden", "valley", "bridge", "winter",
      "summer", "morning", "evening", "harvest", "village", "market",
      "forest", "stone", "cloud", "sparrow", "meandering", "gentle",
      "quiet", "golden", "distant", "weathered", "peaceful", "rolling",
      "shimmering")
    val rng = new scala.util.Random(99)
    val distinct = (1 to 20).map { i =>
      val body = Seq.fill(40)(vocab(rng.nextInt(vocab.size))).mkString(" ")
      Row(i.toLong, s"the story $i begins as $body and it ends there")
    }
    val rows = distinct ++
      Seq(Row(21L, prose), Row(22L, prose), Row(23L, prose), // exact dups
        Row(24L, nearDup), Row(25L, spam), Row(26L, "tiny"))
    df("doc_id BIGINT, text STRING", rows: _*)
      .withColumn("n_chars", length(col("text")))
      .withColumn("lang", lit("en"))
  }

  test("curate: dedups, gates quality, drops near-dups, packs — " +
    "deterministically") {
    val cfg = Curation.Config(minQuality = 0.3, sampleRate = 1.0,
      nearDupJaccard = 0.8, packBudget = 256L, groupCols = Seq("lang"))
    val out = Curation.curate(corpus(), "doc_id", "text", "n_chars", cfg)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(22L) && !ids.contains(23L), "exact dups dropped")
    assert(ids.contains(21L), "first copy kept")
    assert(!ids.contains(25L), "spam gated by quality")
    assert(!ids.contains(26L), "fragment gated by quality")
    assert(!ids.contains(24L) || !ids.contains(21L),
      "near-dup pair collapsed to one survivor")
    assert((1L to 20L).forall(ids.contains), "unique prose survives")
    // packed columns present and chunk offsets within budget
    assert(out.columns.toSet.intersect(
      Set("chunk_id", "chunk_offset", "quality_score")).size == 3)
    assert(out.filter(col("chunk_offset") >= 256L).count() == 0)
    // deterministic: a second run over a repartitioned input is identical
    val again = Curation.curate(corpus().repartition(7), "doc_id", "text",
        "n_chars", cfg)
      .select("doc_id", "chunk_id", "chunk_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val first = out.select("doc_id", "chunk_id", "chunk_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == first)
  }

  test("curate nearDupExact face: exact-Jaccard pairwise stage drops " +
    "the planted near-dup, pipeline otherwise identical to the LSH face") {
    val base = Curation.Config(minQuality = 0.3, sampleRate = 1.0,
      nearDupJaccard = 0.5, packBudget = 256L, groupCols = Seq("lang"))
    val exact = Curation.curate(corpus(), "doc_id", "text", "n_chars",
        base.copy(nearDupExact = true))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!exact.contains(22L) && !exact.contains(23L))
    assert(!exact.contains(24L) || !exact.contains(21L),
      "near-dup pair must collapse under the exact face too")
    assert((1L to 20L).forall(exact.contains), "unique prose survives")
  }

  test("funnel reports monotone survivor counts through every " +
    "row-changing stage, and `packed` matches what curate emits") {
    val f = Curation.funnel(corpus(), "doc_id", "text").toMap
    assert(f("input") == 26L)
    assert(f("exact_dedup") == 24L) // 22, 23 collapse into 21
    assert(f("quality_gate") < f("exact_dedup"))
    assert(f("sampled") == f("quality_gate")) // rate 1.0
    assert(f("near_dup") == f("sampled") - 1) // the prose near-dup pair
    val curated = Curation.curate(corpus(), "doc_id", "text", "n_chars",
      Curation.Config(packBudget = 256L)).count()
    assert(f("packed") == curated,
      s"funnel packed ${f("packed")} != curate rows $curated")
  }

  test("funnelDf matches funnel stage-for-stage, with the LSH stage " +
    "on and off") {
    for (cfg <- Seq(Curation.Config(), // LSH on (default 0.8)
                    Curation.Config(nearDupJaccard = 0.0, sampleRate = 0.9,
                      seed = 5L))) {
      val seq = Curation.funnel(corpus(), "doc_id", "text", cfg).toMap
      val frame = Curation.funnelDf(corpus(), "doc_id", "text", cfg)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(frame == seq, s"funnelDf != funnel for $cfg")
    }
  }

  test("curate fails fast on a non-integral id column instead of " +
    "silently emptying the corpus") {
    val d = df("doc_id STRING, text STRING, n_chars INT",
      Row("a", "some reasonable text", 20))
    val e = intercept[IllegalArgumentException] {
      Curation.curate(d, "doc_id", "text", "n_chars")
    }
    assert(e.getMessage.contains("integral"))
  }

  private def fullCorpus() = {
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "it runs back to the barn where it sleeps in the hay for a while"
    val boiler = "subscribe to our newsletter today" // planted boilerplate
    val rows = Seq(
      Row(1L, s"$prose", "web"),
      Row(2L, s"$prose", "web"), // exact dup of 1 -> dropped at stage 1
      Row(3L, s"$boiler and the story of the river begins here with a " +
        "quiet morning on the water as the boats drift by slowly", "web"),
      Row(4L, s"$boiler and the tale of the mountain starts here with " +
        "a cold evening near the summit as the wind picks up", "book"),
      Row(5L, "spam spam spam spam spam spam spam spam spam spam", "web"),
      Row(6L, "the golden orchard rests beyond the old stone bridge " +
        "where the sparrows gather in the gentle morning light for a " +
        "while and the village wakes to the sound of the market", "book"))
    df("doc_id BIGINT, text STRING, source STRING", rows: _*)
  }

  test("curateFull: exact dup dropped, boilerplate segments removed " +
    "from every doc, repetition gate kills the spam doc") {
    val cfg = Curation.FullConfig(segTokens = 5, segMinCopies = 2,
      maxDupTokenFrac = 0.5, minQuality = 0.2,
      budgetTokens = 200L, alpha = 0.5, maxEpochs = 2.0)
    val out = Curation.curateFull(fullCorpus(), "doc_id", "text",
      "source", cfg)
    val byDoc = out.collect().groupBy(_.getLong(0))
    // doc 2 is an exact dup of 1; doc 5 dies on dupTokenFrac (0.9)
    assert(!byDoc.contains(2L) && !byDoc.contains(5L))
    // the shared boilerplate 5-token prefix is gone from docs 3 and 4
    for (id <- Seq(3L, 4L) if byDoc.contains(id)) {
      val cleaned = byDoc(id).head.getString(3)
      assert(!cleaned.contains("subscribe to our newsletter"),
        s"doc $id kept boilerplate: $cleaned")
    }
    // epoch copies are 1..n per doc
    byDoc.values.foreach { rows =>
      val copies = rows.map(_.getLong(2)).sorted
      assert(copies.sameElements(1L to copies.length))
    }
  }

  test("curateFull is layout-stable: repartitioned corpus gives " +
    "bit-identical output") {
    val cfg = Curation.FullConfig(segTokens = 5, budgetTokens = 300L)
    val a = Curation.curateFull(fullCorpus(), "doc_id", "text",
        "source", cfg)
      .collect().map(_.toString).sorted
    val b = Curation.curateFull(fullCorpus().repartition(7), "doc_id",
        "text", "source", cfg)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("sourceBalance: hand Gini values — even split is 0, full " +
    "concentration approaches (k-1)/k, max share exact") {
    import org.apache.spark.sql.Row
    def run(rows: Seq[(String, Long)]): (Long, Long, Double, Double) = {
      val d = df("source STRING, tok BIGINT",
        rows.map(r => Row(r._1, r._2)): _*)
      val r = Curation.sourceBalance(d, "source", "tok").collect()(0)
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    }
    // perfectly even: gini 0
    val even = run(Seq("a" -> 10L, "b" -> 10L, "c" -> 10L, "d" -> 10L))
    assert(even == ((4L, 40L, 0.25, 0.0)))
    // all mass in one of 4 sources: gini = (k-1)/k = 0.75
    val conc = run(Seq("a" -> 100L, "b" -> 0L, "c" -> 0L, "d" -> 0L))
    assert(conc._1 == 4L && conc._3 == 1.0)
    assertApprox(conc._4, 0.75)
    // textbook: (1,2,3,4): sad = 2*(1+2+3+1+2+1) = 20; gini = 20/(2*4*10)
    val mix = run(Seq("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L))
    assertApprox(mix._4, 0.25)
    assert(mix._3 == 0.4)
  }

  test("tokenYieldCurve: equal-count tiers, top tier first, cumulative " +
    "tokens and fractions; on-edge ties go to the better tier") {
    import org.apache.spark.sql.Row
    // 10 docs, quality 0.1..1.0, tokens 10*quality — with buckets=2 the
    // median threshold is (0.5+0.6)/2 = 0.55: docs .6-.1.0 are tier 1
    val d = df("doc_id BIGINT, q DOUBLE, tok BIGINT",
      (1 to 10).map(i => Row(i.toLong, i / 10.0, i.toLong)): _*)
    val out = Curation.tokenYieldCurve(d, "q", "tok", buckets = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((5L, 40L, 40L, 40.0 / 55.0))) // tokens 6..10
    assert(out(2L) == ((5L, 15L, 55L, 1.0)))         // tokens 1..5
    // on-edge: all equal quality -> every doc >= every threshold ->
    // everything lands in tier 1, lower tiers emit no rows
    val tied = df("doc_id BIGINT, q DOUBLE, tok BIGINT",
      (1 to 6).map(i => Row(i.toLong, 0.5, 1L)): _*)
    val t = Curation.tokenYieldCurve(tied, "q", "tok", buckets = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t == Map(1L -> 6L))
    // NULL quality rows are excluded, not silently bucketed
    val withNull = df("doc_id BIGINT, q DOUBLE, tok BIGINT",
      Row(1L, 0.2, 5L), Row(2L, null, 100L), Row(3L, 0.8, 7L))
    val n = Curation.tokenYieldCurve(withNull, "q", "tok", buckets = 2)
      .agg(org.apache.spark.sql.functions.sum("sum_tokens"))
      .collect()(0).getLong(0)
    assert(n == 12L)
  }
}
