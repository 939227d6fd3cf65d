package graft.operators

import org.apache.spark.sql.Row
import graft.SparkSpec

class CohortsSpec extends SparkSpec {

  // periodNs = 10: user u active at ts t -> period t/10
  private def activity(rows: (Long, Long)*) =
    df("u BIGINT, ts BIGINT", rows.map { case (u, t) => Row(u, t) }: _*)

  private def matrix(d: org.apache.spark.sql.DataFrame) =
    Cohorts.retention(d, "u", "ts", periodNs = 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet

  test("two cohorts with churn and a returning user") {
    // cohort 0: users 1,2,3 (periods 0..); cohort 1: user 4
    val d = activity(
      (1L, 1L), (1L, 12L), (1L, 25L),  // u1: periods 0,1,2
      (2L, 5L), (2L, 27L),             // u2: periods 0,2 (skips 1)
      (3L, 9L),                        // u3: period 0 only
      (4L, 15L), (4L, 23L))            // u4: cohort 1, periods 1,2
    assert(matrix(d) == Set(
      (0L, 0L, 3L, 3L, 1.0),
      (0L, 1L, 1L, 3L, 1.0 / 3.0),
      (0L, 2L, 2L, 3L, 2.0 / 3.0),
      (1L, 0L, 1L, 1L, 1.0),
      (1L, 1L, 1L, 1L, 1.0)))
  }

  test("duplicate events in one period collapse: counts are per user") {
    val d = activity((1L, 1L), (1L, 2L), (1L, 3L), (2L, 4L), (2L, 14L),
      (2L, 15L), (2L, 16L))
    assert(matrix(d) == Set(
      (0L, 0L, 2L, 2L, 1.0),
      (0L, 1L, 1L, 2L, 0.5)))
  }

  test("offset-0 row always equals the cohort size") {
    val rnd = new scala.util.Random(3)
    val d = activity((1 to 400).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(100).toLong)): _*)
    val m = matrix(d)
    val sizes = m.filter(_._2 == 0L)
    assert(sizes.forall { case (_, _, n, size, r) => n == size && r == 1.0 })
    // every cohort present at offset 0
    assert(m.map(_._1) == sizes.map(_._1))
  }
}
