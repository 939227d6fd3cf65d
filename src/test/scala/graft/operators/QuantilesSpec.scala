package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuantilesSpec extends SparkSpec {

  test("bandFilter keeps rows within exact [lo, hi] quantiles") {
    val d = df("x DOUBLE", (1 to 100).map(i => Row(i.toDouble)): _*)
    val out = Quantiles.bandFilter(d, "x", 0.1, 0.9)
      .collect().map(_.getDouble(0))
    // exact percentile with linear interpolation: p10 = 10.9, p90 = 90.1
    assert(out.min >= 10.9 - 1e-9 && out.max <= 90.1 + 1e-9)
    assert(out.length == 80)
  }

  test("bandFilter per group uses per-group bounds") {
    val rows = (1 to 10).map(i => Row("a", i.toDouble)) ++
      (1 to 10).map(i => Row("b", i * 100.0))
    val d = df("g STRING, x DOUBLE", rows: _*)
    val out = Quantiles.bandFilter(d, "x", 0.25, 0.75, Seq("g"))
    val byG = out.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(byG("a").head >= 3.0 && byG("a").last <= 8.0)
    assert(byG("b").head >= 300.0 && byG("b").last <= 800.0)
  }

  test("bandFilter approx path: sketch bounds keep the same interior " +
    "rows as exact on a well-separated distribution") {
    import org.apache.spark.sql.Row
    val d = df("g STRING, v DOUBLE",
      (1 to 500).map(i => Row("a", i.toDouble)): _*)
    val exact = Quantiles.bandFilter(d, "v", 0.1, 0.9, by = Seq("g"))
      .collect().map(_.getDouble(1)).toSet
    val approx = Quantiles.bandFilter(d, "v", 0.1, 0.9, by = Seq("g"),
        approx = true).collect().map(_.getDouble(1)).toSet
    // the sketch returns actual elements where exact INTERPOLATES between
    // ranks, so each band edge can admit/drop at most one boundary row
    val diff = (exact -- approx) ++ (approx -- exact)
    assert(diff.size <= 2, s"boundary drift too large: $diff")
    assert((exact & approx).size >= exact.size - 2)
  }

  private def sortRef(d: org.apache.spark.sql.DataFrame, c: String,
                      qs: Seq[Double]): Seq[Double] =
    Quantiles.sortedRankPercentiles(
      d.select(col(c).cast("double").as("__v")).na.drop(), qs)

  test("exactPercentiles bracket path matches the distributed-sort " +
    "reference on a noisy duplicate-heavy distribution") {
    val rnd = new scala.util.Random(42)
    val d = df("v DOUBLE",
      (1 to 5000).map(_ =>
        Row(math.floor(rnd.nextGaussian() * 100) / 7.0)): _*)
    val qs = Seq(0.0, 0.01, 0.25, 0.5, 0.975, 1.0)
    Quantiles.exactPercentiles(d, "v", qs).zip(sortRef(d, "v", qs))
      .foreach { case (fast, ref) => assertApprox(fast, ref) }
  }

  test("exactPercentiles survives constant and single-heavy-value " +
    "columns (the degenerate-sketch edge)") {
    val const = df("v DOUBLE", (1 to 100).map(_ => Row(5.0)): _*)
    assert(Quantiles.exactPercentiles(const, "v", Seq(0.1, 0.9)) ==
      Seq(5.0, 5.0))
    // 90% of mass on one value: brackets collapse onto the heavy value
    val heavy = df("v DOUBLE",
      ((1 to 900).map(_ => Row(1.0)) ++
        (1 to 100).map(i => Row(100.0 + i))): _*)
    val qs = Seq(0.05, 0.5, 0.89, 0.95)
    Quantiles.exactPercentiles(heavy, "v", qs).zip(sortRef(heavy, "v", qs))
      .foreach { case (fast, ref) => assertApprox(fast, ref) }
  }

  test("exactPercentiles accuracy parameter: a coarse sketch still " +
    "resolves exact values (wider brackets or sort fallback)") {
    val d = df("v DOUBLE", (1 to 2000).map(i => Row(i.toDouble)): _*)
    val qs = Seq(0.1, 0.5, 0.9)
    // accuracy=200 gives rank error ~n/200 = 10 — brackets stay exact
    Quantiles.exactPercentiles(d, "v", qs, accuracy = 200)
      .zip(sortRef(d, "v", qs))
      .foreach { case (fast, ref) => assertApprox(fast, ref) }
  }

  test("winsorize clips at exact percentiles, keeps every row") {
    import org.apache.spark.sql.Row
    // values 1..11: q10 = 2.0, q90 = 10.0 (exact ranks, no interpolation)
    val d = df("id BIGINT, v DOUBLE",
      (1 to 11).map(i => Row(i.toLong, i.toDouble)): _*)
    val out = Quantiles.winsorize(d, "v", 0.1, 0.9).orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("v_wins")).toMap
    assert(out.size == 11)
    assert(out(1L) == 2.0 && out(2L) == 2.0)    // lower tail clipped
    assert(out(10L) == 10.0 && out(11L) == 10.0) // upper tail clipped
    assert(out(5L) == 5.0 && out(9L) == 9.0)    // interior untouched
  }

  test("groupQuantileRank == one group-wide window (differential); " +
    "ties break by id; single-value group degenerates correctly") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { i =>
      val g = s"src${i % 3}"
      // src2 is single-valued (the degenerate bucket-0 case); ties
      // planted everywhere via a coarse value grid
      val v = if (g == "src2") 7.0 else (rnd.nextInt(20)).toDouble
      Row(i.toLong, g, v)
    }
    val d = df("id BIGINT, src STRING, v DOUBLE", rows: _*)
    val got = Quantiles.groupQuantileRank(d, Seq("src"), "v", "id",
        nBuckets = 8)
      .select("id", "quantile_rank").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = Window.partitionBy(col("src")).orderBy(col("v"), col("id"))
    val cw = Window.partitionBy(col("src"))
    val ref = d.withColumn("pct",
        (row_number().over(w).cast("long") - 1L) / count(lit(1)).over(cw))
      .select("id", "pct").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == ref)
    // layout stability
    val again = Quantiles.groupQuantileRank(d.repartition(13), Seq("src"),
        "v", "id", nBuckets = 8)
      .select("id", "quantile_rank").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == got)
    // ranks inside a group are a permutation of k/n
    val n2 = rows.count(_.getString(1) == "src2")
    val src2 = rows.filter(_.getString(1) == "src2").map(_.getLong(0))
      .map(got).sorted
    assert(src2 == (0 until n2).map(_.toDouble / n2))
  }

  test("groupQuantileRank keeps NULL values (ranked first, window " +
    "semantics) and NULL group keys — no silent row drops") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.expressions.Window
    val rows = Seq(
      Row(1L, "a", 5.0), Row(2L, "a", null), Row(3L, "a", 1.0),
      Row(4L, "a", null), Row(5L, "a", 9.0),
      // a NULL group key with mixed values
      Row(6L, null, 3.0), Row(7L, null, null), Row(8L, null, 8.0),
      // an all-NULL-value group
      Row(9L, "b", null), Row(10L, "b", null))
    val d = df("id BIGINT, src STRING, v DOUBLE", rows: _*)
    val out = Quantiles.groupQuantileRank(d, Seq("src"), "v", "id",
        nBuckets = 4)
      .select("id", "quantile_rank").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size == rows.size, s"rows dropped: kept ${out.keySet}")
    val w = Window.partitionBy(col("src"))
      .orderBy(col("v").asc_nulls_first, col("id"))
    val cw = Window.partitionBy(col("src"))
    val ref = d.withColumn("pct",
        (row_number().over(w).cast("long") - 1L) / count(lit(1)).over(cw))
      .select("id", "pct").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == ref)
    // NULLs rank before every value in their group
    assert(Set(out(2L), out(4L)) == Set(0.0, 0.2))
    assert(out(7L) == 0.0 && out(9L) == 0.0 && out(10L) == 0.5)
  }

  // ---- madOutliers ----

  private def interpMedian(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val h = (s.length - 1) * 0.5
    val lo = s(h.toInt); val hi = s(math.ceil(h).toInt)
    lo + (hi - lo) * (h - h.toInt)
  }

  test("madOutliers matches a driver-side median/MAD reference and " +
    "flags only the planted outlier") {
    val base = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0)
    val vals = base :+ 1000.0
    val rows = vals.zipWithIndex.map { case (v, i) => Row(i.toLong, "g", v) }
    val d = df("id BIGINT, grp STRING, v DOUBLE", rows: _*)
    val out = Quantiles.madOutliers(d, Seq("grp"), "v")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("group_median"), r.getAs[Double]("group_mad"),
          r.getAs[Any]("robust_z"), r.getAs[Boolean]("is_outlier"))))
      .toMap
    val med = interpMedian(vals)
    val mad = interpMedian(vals.map(v => math.abs(v - med)))
    vals.zipWithIndex.foreach { case (v, i) =>
      val (gmed, gmad, z, flag) = out(i.toLong)
      assert(gmed == med && gmad == mad)
      assert(approx(z.asInstanceOf[Double], 0.6745 * (v - med) / mad))
      assert(flag == (math.abs(v - med) > 3.5 / 0.6745 * mad), s"v=$v")
    }
    assert(out.values.count(_._4) == 1)
    assert(out(9L)._4) // the planted 1000.0
  }

  test("madOutliers: an all-equal group has MAD 0 — off-median rows " +
    "flag, robust_z is NULL; groups are independent") {
    val d = df("id BIGINT, grp STRING, v DOUBLE",
      Row(1L, "a", 5.0), Row(2L, "a", 5.0), Row(3L, "a", 5.0),
      Row(4L, "a", 7.0),
      Row(5L, "b", 1.0), Row(6L, "b", 2.0), Row(7L, "b", 3.0))
    val out = Quantiles.madOutliers(d, Seq("grp"), "v")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Any]("robust_z"), r.getAs[Boolean]("is_outlier"))))
      .toMap
    // group a: median 5, MAD 0 -> only the 7.0 flags, z NULL everywhere
    assert(out(4L)._2 && !out(1L)._2 && !out(2L)._2 && !out(3L)._2)
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_)._1 == null))
    // group b: clean spread, nothing flags, z finite
    assert(Seq(5L, 6L, 7L).forall(id => !out(id)._2 && out(id)._1 != null))
  }
}
