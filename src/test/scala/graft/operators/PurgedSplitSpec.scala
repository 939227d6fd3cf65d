package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PurgedSplitSpec extends SparkSpec {

  // 12 rows at ns times 0..11 (scaled so the arithmetic is visible),
  // k = 3 -> folds of 4: [0,3], [4,7], [8,11]
  private def fixture = {
    val rows = (0L until 12L).map(i => Row(i * 10L, i))
    df("ts_ns BIGINT, id BIGINT", rows: _*)
  }

  test("fold assignment: equal-count contiguous time blocks") {
    val folds = PurgedSplit.purgedKFold(fixture, "ts_ns", "id", 3, 0L, 0L)
      .filter(col("role") === "test")
      .select(col("fold"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(folds.toSeq == (0L until 12L).map(i => (i / 4, i)).sorted)
  }

  test("purge: label overlap with the test fold's label extent") {
    // H = 25 ns: fold 1 spans ts [40, 70], label extent [40, 95].
    // A train candidate is purged iff ts <= 95 && ts + 25 >= 40, i.e.
    // ts in [15, 95] -> ids 2,3 (ts 20,30) before and ids 8,9 (80,90)
    // after are purged; ids 0,1 and 10,11 stay train-eligible...
    // id 10 (ts 100) > 95 -> embargo-range check with E = 0 -> train.
    val roles = PurgedSplit.purgedKFold(fixture, "ts_ns", "id", 3, 25L, 0L)
      .filter(col("fold") === 1)
      .select(col("id"), col("role")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert((4L to 7L).forall(roles(_) == "test"))
    assert(Seq(2L, 3L, 8L, 9L).forall(roles(_) == "purged"))
    assert(Seq(0L, 1L, 10L, 11L).forall(roles(_) == "train"))
  }

  test("embargo strip sits after the label extent") {
    // fold 0 spans [0, 30], H = 5 -> extent [0, 35]; E = 20 ->
    // embargo (35, 55]: ids 4 (40) and 5 (50) embargoed, 6 (60) train.
    val roles = PurgedSplit.purgedKFold(fixture, "ts_ns", "id", 3, 5L, 20L)
      .filter(col("fold") === 0)
      .select(col("id"), col("role")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(Seq(4L, 5L).forall(roles(_) == "embargo"))
    assert(roles(6L) == "train")
    // backward purge: a pre-test row can never overlap fold 0's extent
    // here (none exist before ts 0), and every test row is test
    assert((0L to 3L).forall(roles(_) == "test"))
  }

  test("driver differential: roles match a brute-force reference") {
    val k = 4; val h = 17L; val e = 9L
    val ts = Seq(3L, 3L, 10L, 21L, 22L, 40L, 41L, 55L, 56L, 70L, 90L,
      95L, 120L, 121L, 140L, 170L).zipWithIndex
      .map { case (t, i) => (t * 7L, i.toLong) }
    val frame = df("ts_ns BIGINT, id BIGINT",
      ts.map { case (t, i) => Row(t, i) }: _*)
    val got = PurgedSplit.purgedKFold(frame, "ts_ns", "id", k, h, e)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getString(2)))
      .toMap
    // reference: sort by (ts, id), fold = pos*k/n, explicit role rules
    val sorted = ts.sortBy { case (t, i) => (t, i) }
    val n = sorted.size
    val fold = sorted.zipWithIndex
      .map { case ((_, id), p) => id -> (p * k / n).toLong }.toMap
    val ext = sorted.groupBy { case (_, id) => fold(id) }
      .map { case (f, rs) => f -> (rs.map(_._1).min, rs.map(_._1).max) }
    for ((t, id) <- ts; f <- 0L until k.toLong) {
      val (lo, hi) = ext(f)
      val want =
        if (fold(id) == f) "test"
        else if (t <= hi + h && t + h >= lo) "purged"
        else if (t > hi + h && t <= hi + h + e) "embargo"
        else "train"
      assert(got((f, id)) == want, s"fold $f id $id ts $t")
    }
  }

  test("trainingSet keeps exactly the train-role rows with their columns") {
    val frame = fixture.withColumn("feature", col("id") * 100L)
    val train = PurgedSplit.trainingSet(frame, "ts_ns", "id", 3, 25L, 0L,
      testFold = 1)
    val ids = train.select(col("id")).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(0L, 1L, 10L, 11L))
    assert(train.columns.toSet == Set("ts_ns", "id", "feature"))
  }

  test("null ts rows rank first and are never purged or embargoed") {
    val rows = Row(null, 99L) +: (0L until 7L).map(i => Row(i * 10L, i))
    val frame = df("ts_ns BIGINT, id BIGINT", rows: _*)
    val roles = PurgedSplit.purgedKFold(frame, "ts_ns", "id", 2, 100L, 50L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getString(2)))
      .toMap
    assert(roles((0L, 99L)) == "test") // null leads -> fold 0
    assert(roles((1L, 99L)) == "train") // no time, nothing to purge
  }

  test("rejects bad parameters") {
    intercept[IllegalArgumentException](
      PurgedSplit.purgedKFold(fixture, "ts_ns", "id", 1, 0L, 0L))
    intercept[IllegalArgumentException](
      PurgedSplit.purgedKFold(fixture, "ts_ns", "id", 2, -1L, 0L))
    intercept[IllegalArgumentException](
      PurgedSplit.trainingSet(fixture, "ts_ns", "id", 2, 0L, 0L, 2))
  }
}
