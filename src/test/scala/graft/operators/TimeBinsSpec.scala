package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** W7 semantics: right-closed ceil bins (pandas .ceil parity), floor bins,
  * spine generation, densification, drop-last-bin. */
class TimeBinsSpec extends SparkSpec {

  test("ceilNs: exact multiples map to themselves, others to next edge") {
    val d = df("ts BIGINT",
      Row(0L), Row(1L), Row(999L), Row(1000L), Row(1001L), Row(2000L))
    val out = d.select(col("ts"), TimeBins.ceilNs(col("ts"), 1000L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 0L)      // pandas: on-edge maps to itself
    assert(out(1L) == 1000L)
    assert(out(999L) == 1000L)
    assert(out(1000L) == 1000L)
    assert(out(1001L) == 2000L)
    assert(out(2000L) == 2000L)
  }

  test("floorNs: left-closed labeling") {
    val d = df("ts BIGINT", Row(0L), Row(999L), Row(1000L), Row(1500L))
    val out = d.select(col("ts"), TimeBins.floorNs(col("ts"), 1000L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 0L && out(999L) == 0L)
    assert(out(1000L) == 1000L && out(1500L) == 1000L)
  }

  test("spine covers [ceil(start), end] inclusive with step") {
    val d = df("x BIGINT", Row(1L))
    val bins = TimeBins.spine(d, 1500L, 5000L, 1000L)
      .collect().map(_.getLong(0)).sorted
    assert(bins.sameElements(Array(2000L, 3000L, 4000L, 5000L)))
  }

  test("densify fills missing bins with 0") {
    val agg = df("bin_ns BIGINT, n BIGINT", Row(1000L, 5L), Row(3000L, 2L))
    val spine = TimeBins.spine(agg, 1000L, 4000L, 1000L)
    val out = TimeBins.densify(agg, spine, "bin_ns", Nil, Seq("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1000L -> 5L, 2000L -> 0L, 3000L -> 2L, 4000L -> 0L))
  }

  test("densify with keys produces full key x bin grid") {
    val agg = df("bin_ns BIGINT, k STRING, n BIGINT",
      Row(1000L, "a", 1L), Row(2000L, "b", 2L))
    val spine = TimeBins.spine(agg, 1000L, 2000L, 1000L)
    val out = TimeBins.densify(agg, spine, "bin_ns", Seq("k"), Seq("n"))
    assert(out.count() == 4) // 2 bins x 2 keys
    val zero = out.filter(col("k") === "a" && col("bin_ns") === 2000L)
      .collect()(0).getLong(2)
    assert(zero == 0L)
  }

  test("dropLastBin removes only the max bin") {
    val d = df("bin_ns BIGINT, n BIGINT",
      Row(1000L, 1L), Row(2000L, 2L), Row(3000L, 3L))
    val out = TimeBins.dropLastBin(d, "bin_ns").collect().map(_.getLong(0))
    assert(out.sorted.sameElements(Array(1000L, 2000L)))
  }

  test("ceil arithmetic is exact beyond 2^53 (nanosecond epochs)") {
    val big = 1723400000123456789L // ~2024 epoch-nanos; not Double-exact
    val d = df("ts BIGINT", Row(big))
    val step = 60L * 1000000000L
    val out = d.select(TimeBins.ceilNs(col("ts"), step)).collect()(0).getLong(0)
    val expect = big + java.lang.Math.floorMod(-big, step)
    assert(out == expect)
    assert(out - big < step && out % step == 0)
  }

  test("twap: staircase holding-time weights — hand bin, burst " +
    "robustness, tie timestamps, no carry across bins") {
    // key u, bin [0, 100): v=10 holds [5,20), v=2 holds [20,90),
    // v=8 holds [90,100) -> twap = (10*15 + 2*70 + 8*10)/95
    val d = df("k STRING, id BIGINT, ts BIGINT, v DOUBLE",
      Row("u", 1L, 5L, 10.0), Row("u", 2L, 20L, 2.0),
      Row("u", 3L, 90L, 8.0),
      // next bin: single event holds [150, 200)
      Row("u", 4L, 150L, 4.0),
      // key w: a 3-event burst at ts=10 (ties -> dt 0 for first two),
      // then quiet — plain avg would say 34/4, twap holds v=1 for 90%
      Row("w", 5L, 0L, 1.0), Row("w", 6L, 10L, 30.0),
      Row("w", 7L, 10L, 2.0), Row("w", 8L, 10L, 1.0))
    val out = TimeBins.twap(d, Seq("k"), "ts", "v", 100L, "id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(("u", 0L)) ==
      ((3L, 95L, (10.0 * 15 + 2.0 * 70 + 8.0 * 10) / 95.0)))
    assert(out(("u", 100L)) == ((1L, 50L, 4.0)))
    // burst: first copy holds [0,10), last tie copy holds [10,100)
    val (n, wgt, tw) = out(("w", 0L))
    assert(n == 4L && wgt == 100L)
    assert(approx(tw, (1.0 * 10 + 1.0 * 90) / 100.0))
  }

  test("twap: NULL values extend the prior staircase level instead of " +
    "deflating the bin; all-NULL bins emit no row") {
    // v=10 holds [0,60) because the NULL at ts=30 is not a new level;
    // v=4 holds [60,100) -> twap = (10*60 + 4*40)/100
    val d = df("k STRING, id BIGINT, ts BIGINT, v DOUBLE",
      Row("u", 1L, 0L, 10.0), Row("u", 2L, 30L, null),
      Row("u", 3L, 60L, 4.0),
      // key x: only NULL observations -> no output row at all
      Row("x", 4L, 10L, null))
    val out = TimeBins.twap(d, Seq("k"), "ts", "v", 100L, "id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set(("u", 0L)))
    assert(out(("u", 0L)) ==
      ((2L, 100L, (10.0 * 60 + 4.0 * 40) / 100.0)))
  }
}
