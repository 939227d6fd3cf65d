package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.SparkSpec

/** Property test: the right-closed binning chain (ceil → spine →
  * densify → last-bin drop) against a driver-side brute-force reference
  * over random event sets — SURVEY §7.4 #3's trap class. The generator
  * plants timestamps EXACTLY on bin edges (a ceil that maps an exact
  * multiple anywhere but itself is the classic off-by-one), duplicate
  * timestamps, and single-bin groups (whose dropLastBin output must be
  * empty). TimeBinsSpec pins hand-computed goldens; this pins the
  * boundary algebra a fixture can miss.
  */
class TimeBinsPropertySpec extends SparkSpec {

  private def ceilRef(ts: Long, step: Long): Long =
    ts + java.lang.Math.floorMod(-ts, step)
  private def floorRef(ts: Long, step: Long): Long =
    ts - java.lang.Math.floorMod(ts, step)

  test("ceilNs/floorNs algebra on random (incl. negative) timestamps") {
    val gen = for {
      step <- Gen.choose(1L, 50L)
      ts <- Gen.oneOf(
        Gen.choose(-200L, 200L),
        // exact multiples: the right-closed fixpoint case
        Gen.choose(-8L, 8L).map(_ * step))
    } yield (ts, step)
    val prop = Prop.forAll(gen) { case (ts, step) =>
      val r = df("ts BIGINT", Row(ts))
        .select(TimeBins.ceilNs(col("ts"), step),
          TimeBins.floorNs(col("ts"), step))
        .head()
      val (c, f) = (r.getLong(0), r.getLong(1))
      c == ceilRef(ts, step) && f == floorRef(ts, step) &&
        c >= ts && c - ts < step && c % step == 0 &&
        f <= ts && ts - f < step &&
        (ts % step != 0 || (c == ts && f == ts))
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(120), prop)
    assert(res.passed, res.status.toString)
  }

  test("spine + densify + dropLastBin matches brute force on 100+ cases") {
    val genCase = for {
      step <- Gen.choose(2L, 12L)
      n <- Gen.choose(1, 40)
      nKeys <- Gen.choose(1, 3)
      ts <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(0L, 60L),
        Gen.choose(0L, 10L).map(_ * step))) // on-edge plants
      ks <- Gen.listOfN(n, Gen.choose(0, nKeys - 1))
    } yield (ts, ks.map(i => s"k$i"), step)

    val prop = Prop.forAll(genCase) { case (ts, ks, step) =>
      val events = ts.zip(ks)
      val start = ts.min
      val end = ceilRef(ts.max, step)
      val rows = events.zipWithIndex.map { case ((t, k), i) =>
        Row(i.toLong, k, t)
      }
      val input = df("id BIGINT, k STRING, ts BIGINT", rows: _*)
      val agg = input
        .withColumn("bin_ns", TimeBins.ceilNs(col("ts"), step))
        .groupBy("k", "bin_ns").agg(count(lit(1)).as("n"))
      val spine = TimeBins.spine(input, start, end, step)
      val dense = TimeBins.densify(agg, spine, "bin_ns", Seq("k"), Seq("n"))
      val got = dense.collect()
        .map(r => (r.getAs[String]("k"), r.getAs[Long]("bin_ns")) ->
          r.getAs[Long]("n")).toMap
      val gotDrop = TimeBins.dropLastBin(dense, "bin_ns", Seq("k"))
        .collect()
        .map(r => (r.getAs[String]("k"), r.getAs[Long]("bin_ns")) ->
          r.getAs[Long]("n")).toMap

      // brute force: full (key, bin) grid over the spine, count of
      // events whose ceil lands in the bin, zero-filled
      val bins = (ceilRef(start, step) to end by step).toSeq
      val keys = ks.distinct
      val want = (for { k <- keys; b <- bins } yield (k, b) ->
        events.count { case (t, ek) =>
          ek == k && ceilRef(t, step) == b }.toLong).toMap
      // per-key last-bin drop: strictly below the key's max bin — with
      // a densified frame the max bin is the spine's last for EVERY
      // key, so exactly one spine bin per key disappears
      val wantDrop = want.filter { case ((k, b), _) =>
        b < bins.max }

      val okDense = got == want
      val okDrop = gotDrop == wantDrop
      if (!okDense || !okDrop) {
        System.err.println(s"MISMATCH step=$step events=$events\n" +
          s"  dense only-engine=${(got.toSet -- want.toSet).take(5)} " +
          s"only-ref=${(want.toSet -- got.toSet).take(5)}\n" +
          s"  drop  only-engine=${(gotDrop.toSet -- wantDrop.toSet).take(5)} " +
          s"only-ref=${(wantDrop.toSet -- gotDrop.toSet).take(5)}")
      }
      okDense && okDrop
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(110), prop)
    assert(res.passed, res.status.toString)
  }
}
