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

  private def evStep(rows: (String, Long, Long, String)*) =
    df("k STRING, id BIGINT, ts BIGINT, step STRING",
      rows.map(r => Row(r._1, r._2, r._3, r._4)): _*)

  test("transitions: within-gap consecutive pairs only; session breaks " +
    "and key boundaries yield no transition") {
    val d = evStep(
      ("u", 1L, 0L, "view"), ("u", 2L, 50L, "click"),
      ("u", 3L, 100L, "view"),
      ("u", 4L, 300L, "buy"),   // gap 200 > 100: new session, no edge
      ("u", 5L, 350L, "view"),
      ("v", 6L, 360L, "click")) // other key: never pairs with u's 350
    val got = Sessionize.transitions(d, Seq("k"), "ts", "step", 100L, "id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("view", "click") -> 1L, ("click", "view") -> 1L,
      ("buy", "view") -> 1L))
  }

  test("transitions equal the withSessionId-based reference (pairs " +
    "grouped by explicit session ids) on a randomized fixture") {
    val rnd = new scala.util.Random(7)
    val steps = Array("a", "b", "c")
    val rows = (1 to 120).map { i =>
      (s"u${rnd.nextInt(4)}", i.toLong, rnd.nextInt(2000).toLong,
        steps(rnd.nextInt(3)))
    }
    val d = evStep(rows: _*)
    val got = Sessionize.transitions(d, Seq("k"), "ts", "step", 150L, "id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // reference: tag sessions, pair consecutive rows inside each session
    val tagged = Sessionize.withSessionId(d, Seq("k"), "ts", 150L, "id")
      .select("k", "session_id", "ts", "id", "step").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val ref = tagged.groupBy(t => (t._1, t._2)).values.toSeq.flatMap {
      sess =>
        sess.sortBy(t => (t._3, t._4)).toList.sliding(2).collect {
          case List(a, b) => (a._5, b._5)
        }
    }.groupBy(p => p).view.mapValues(_.size.toLong).toMap
    assert(got == ref)
  }
}
