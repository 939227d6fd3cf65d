package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SessionizeSpec extends SparkSpec {

  private def ev(rows: (String, Long, Long)*) =
    df("k STRING, id BIGINT, ts BIGINT",
      rows.map(r => Row(r._1, r._2, r._3)): _*)

  test("session boundaries at gaps strictly greater than gapNs") {
    // gap 100: events at 0,50,150(gap 100 -> SAME session),251(gap 101 ->
    // new), 260
    val d = ev(("u", 1L, 0L), ("u", 2L, 50L), ("u", 3L, 150L),
      ("u", 4L, 251L), ("u", 5L, 260L))
    val out = Sessionize.withSessionId(d, Seq("k"), "ts", 100L, "id")
      .orderBy(col("id")).select(col("session_id")).collect()
      .map(_.getLong(0))
    assert(out.sameElements(Array(0L, 0L, 0L, 1L, 1L)))
  }

  test("sessions summary: bounds, duration, counts per key") {
    val d = ev(("u", 1L, 0L), ("u", 2L, 10L), ("u", 3L, 500L),
      ("v", 4L, 0L))
    val out = Sessionize.sessions(d, Seq("k"), "ts", 100L, "id")
      .orderBy(col("k"), col("session_id")).collect()
    assert(out.length == 3)
    val u0 = out(0)
    assert(u0.getAs[Long]("n_events") == 2L)
    assert(u0.getAs[Long]("session_start") == 0L)
    assert(u0.getAs[Long]("session_end") == 10L)
    assert(u0.getAs[Long]("duration_ns") == 10L)
    val u1 = out(1)
    assert(u1.getAs[Long]("n_events") == 1L && u1.getAs[Long]("duration_ns") == 0L)
  }

  test("keys sessionize independently") {
    val d = ev(("a", 1L, 0L), ("b", 2L, 1L), ("a", 3L, 5000L))
    val out = Sessionize.sessions(d, Seq("k"), "ts", 100L, "id")
    assert(out.filter(col("k") === "a").count() == 2)
    assert(out.filter(col("k") === "b").count() == 1)
  }
}
