package graft

import org.apache.spark.sql.functions._

/** Driver-contract smoke: entry() returns rows; every query runs on
  * sf0.001; queries and oracleSql stay consistent. */
class SparkEntrySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs and yields a non-degenerate schema on sf0.001") {
    val empties = Seq("q_embed_neardup", "q_dedup_jaccard") // legit may-be-empty
    SparkEntry.queries.foreach { case (name, fn) =>
      val out = fn(spark, sf)
      assert(out.columns.nonEmpty, s"$name: no columns")
      // .rdd.count(), not .count(): a plain count lets Catalyst PRUNE
      // every projected column, so an expression whose generated code
      // doesn't compile sails through untested (q_lang_id's argmax fold
      // hid exactly that way). The RDD conversion materializes every
      // column, so with codegen fallback disabled (SparkSpec) this test
      // is the compile tripwire for all gate expressions.
      val n = out.rdd.count()
      if (!empties.contains(name))
        assert(n > 0, s"$name: returned 0 rows on sf0.001")
    }
  }

  test("shared trade-graph fixture survives an RDD block sweep: a " +
    "dead checkpoint is rebuilt, not read (r18 sweep-kill regression)") {
    // Bench/ScaleBench/SoakSpec drop all persistent RDDs between
    // queries; a cached localCheckpoint whose blocks were swept must
    // be revalidated and rebuilt — the original bug read the dead
    // checkpoint and threw CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.
    assert(SparkEntry.queries("q_pagerank")(spark, sf).rdd.count() > 0)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    assert(SparkEntry.queries("q_ppr")(spark, sf).rdd.count() > 0)
    // and the id registry only reports LIVE fixtures
    val ids = SparkEntry.sharedFixtureRddIds(spark)
    val live = spark.sparkContext.getPersistentRDDs.keySet
    assert(ids.subsetOf(live), s"dead fixture ids reported: ${ids -- live}")
  }

  test("graft.noSharedFixtures=1 bypasses the fixture cache: gate " +
    "construction registers no new shared fixture (ScaleBench must " +
    "measure uncached cost)") {
    val before = SparkEntry.sharedFixtureRddIds(spark)
    System.setProperty("graft.noSharedFixtures", "1")
    try assert(SparkEntry.queries("q_pagerank")(spark, sf).rdd.count() > 0)
    finally System.clearProperty("graft.noSharedFixtures")
    assert(SparkEntry.sharedFixtureRddIds(spark) == before,
      "a bypassed gate construction must not add/replace a cached fixture")
  }

  test("sharedFixtureRddIds is scoped to the sweeping session: another " +
    "session's fixture ids never leak into this session's spare set " +
    "(r18 ADVICE — per-context RDD id counters collide across sessions)") {
    assert(SparkEntry.queries("q_pagerank")(spark, sf).rdd.count() > 0)
    assert(SparkEntry.sharedFixtureRddIds(spark).nonEmpty)
    // a sibling session on the same context registers its OWN fixture;
    // ids reported for it must not appear in ours and vice versa
    val sibling = spark.newSession()
    assert(SparkEntry.queries("q_pagerank")(sibling, sf).rdd.count() > 0)
    val mine = SparkEntry.sharedFixtureRddIds(spark)
    val theirs = SparkEntry.sharedFixtureRddIds(sibling)
    assert(mine.nonEmpty && theirs.nonEmpty)
    assert(mine.intersect(theirs).isEmpty,
      s"fixture ids shared across sessions: ${mine.intersect(theirs)}")
  }

  test("shared-fixture builds are drained with their wall cost exactly " +
    "once (Bench stamps who paid each build — r18 verdict item 6)") {
    SparkEntry.drainFixtureBuilds() // clear anything earlier tests built
    // force a rebuild by sweeping the checkpoint blocks
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    assert(SparkEntry.queries("q_triangles")(spark, sf).rdd.count() > 0)
    val builds = SparkEntry.drainFixtureBuilds()
    assert(builds.exists { case (n, sec) =>
      n == "coPurchasePairs" && sec > 0 }, s"got $builds")
    // drained means drained: a second call reports nothing new
    assert(SparkEntry.queries("q_kcore")(spark, sf).rdd.count() > 0)
    val second = SparkEntry.drainFixtureBuilds()
    assert(!second.exists(_._1 == "coPurchasePairs"),
      s"cache hit logged as a build: $second")
  }

  test("OI output bounded and spine densification yields zero-filled bins") {
    val oi = SparkEntry.queries("q_a1_oi")(spark, sf)
    val vals = oi.select(col("oi_micro")).collect()
      .filterNot(_.isNullAt(0)).map(_.getLong(0))
    assert(vals.forall(v => v >= -1000000L && v <= 1000000L))
    val spine = SparkEntry.queries("q_j5_spine")(spark, sf)
    assert(spine.count() > 0)
  }
}
