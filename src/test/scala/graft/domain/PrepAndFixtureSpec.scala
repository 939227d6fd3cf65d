package graft.domain

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.{Prep, Schema}
import graft.fixtures.LobsterFixture

class PrepAndFixtureSpec extends SparkSpec {

  private lazy val raw = LobsterFixture.rawDay(spark).cache()
  private lazy val prepped = LobsterFixture.fullDay(spark).cache()

  test("fixture honors its contract") {
    assert(raw.count() >= 2000)
    // duplicate-timestamp burst exists
    val burst = raw.groupBy(col("time_s")).count().filter(col("count") >= 3)
    assert(burst.count() >= 1)
    // sentinel rows exist
    assert(raw.filter(col("ask_price_1") === Schema.NoAskSentinel)
      .count() == 1)
    assert(raw.filter(col("bid_price_1") === Schema.NoBidSentinel)
      .count() == 1)
    // hidden execs exist
    assert(raw.filter(col("event_type") === 5).count() > 10)
  }

  test("event_number: cumcount within identical timestamps, seq order") {
    val burstT = 12 * 3600.0 + 0.123456
    val rows = prepped.filter(col("time_s") === burstT)
      .orderBy(col("seq"))
      .select(col("event_number"), col("event_number_at_t")).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(0)).sameElements(Array(0L, 1L, 2L)))
    assert(rows.forall(_.getLong(1) == 3L))
  }

  test("sessionFilter keeps [10:00, 15:30] inclusive") {
    val f = Prep.sessionFilter(
      graft.core.Ingest.withEventTime(raw))
    val ts = f.agg(min(col("time_s")), max(col("time_s"))).collect()(0)
    assert(ts.getDouble(0) >= 36000.0)
    assert(ts.getDouble(1) <= 55800.0)
    assert(f.count() > 1000) // core session holds most events
  }

  test("dropDuplicateKeys keeps one row per event key") {
    val d = Prep.dropDuplicateKeys(Prep.addEventKey(
      graft.core.Ingest.withEventTime(raw)))
    val dupes = d.groupBy(col("ticker"), col("date"), col("event_time"),
      col("event_number")).count().filter(col("count") > 1)
    assert(dupes.count() == 0)
  }

  test("withEventTime: event_time equals date + time_s at micro precision") {
    val r = prepped.select(col("time_s"),
      unix_micros(col("event_time"))).collect().head
    val expect = LobsterFixture.Day.toLocalDate.toEpochDay * 86400000000L +
      (r.getDouble(0) * 1e6).toLong
    assert(r.getLong(1) == expect)
  }

  test("timeOrderSeq: global (ts, tie) ordinal; NULL timestamps kept " +
    "and ordered first (Spark nulls-first), never silently dropped") {
    import org.apache.spark.sql.Row
    val rows = Seq(
      Row(java.lang.Long.valueOf(7L * 3600L * 1000000000L + 5L), 1L),
      Row(java.lang.Long.valueOf(2L * 3600L * 1000000000L), 2L),
      Row(null.asInstanceOf[java.lang.Long], 3L),
      Row(java.lang.Long.valueOf(2L * 3600L * 1000000000L), 0L),
      Row(null.asInstanceOf[java.lang.Long], 1L))
    val d = df("ts_ns BIGINT, id BIGINT", rows: _*)
    val out = Prep.timeOrderSeq(d, "ts_ns", "id")
      .select(col("pos"), col("ts_ns"), col("id")).collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), r.getLong(2)))
      .toMap
    assert(out.size == 5, s"rows lost: $out")
    // nulls first (tie on id), then ts ascending with id tiebreak
    assert(out(0L)._1.isEmpty && out(0L)._2 == 1L)
    assert(out(1L)._1.isEmpty && out(1L)._2 == 3L)
    assert(out(2L) == ((Some(2L * 3600L * 1000000000L), 0L)))
    assert(out(3L) == ((Some(2L * 3600L * 1000000000L), 2L)))
    assert(out(4L)._2 == 1L)
  }
}
