package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  private def pts(rows: (String, Long, Long)*) =
    df("k STRING, pid BIGINT, p BIGINT",
      rows.map { case (k, id, p) => Row(k, id, p) }: _*)

  private def ivs(rows: (String, Long, Long, Long)*) =
    df("k STRING, iid BIGINT, s BIGINT, e BIGINT",
      rows.map { case (k, id, s, e) => Row(k, id, s, e) }: _*)

  test("boundaries inclusive, keys separate, disjoint intervals") {
    val out = RangeJoin.pointInInterval(
      pts(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 21L), ("b", 4L, 15L)),
      ivs(("a", 100L, 10L, 20L), ("a", 101L, 30L, 40L), ("b", 102L, 0L, 14L)),
      Seq("k"), "p", "s", "e", cellNs = 7L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 100L), (2L, 100L))) // 21 out; b point past e
  }

  test("a point inside two overlapping intervals matches both, once each") {
    val out = RangeJoin.pointInInterval(
      pts(("a", 1L, 50L)),
      ivs(("a", 10L, 0L, 100L), ("a", 11L, 40L, 60L)),
      Seq("k"), "p", "s", "e", cellNs = 3L)
      .select("iid").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(10L, 11L)) // exactly-one-cell-per-pair: no dups
  }

  test("differential vs the naive non-equi join on pseudorandom data, " +
    "several cell widths (incl. negative coordinates)") {
    val rnd = new scala.util.Random(7)
    val P = pts((1 to 300).map(i =>
      (s"k${rnd.nextInt(4)}", i.toLong, rnd.nextLong() % 1000L)): _*)
    val I = ivs((1 to 80).map { i =>
      val s = rnd.nextLong() % 1000L
      (s"k${rnd.nextInt(4)}", 1000L + i, s, s + rnd.nextInt(300))
    }: _*)
    val naive = P.join(I, Seq("k"))
      .where(col("p") >= col("s") && col("p") <= col("e"))
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    for (cell <- Seq(1L, 13L, 128L, 5000L)) {
      val got = RangeJoin.pointInInterval(P, I, Seq("k"), "p", "s", "e", cell)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got == naive, s"cell=$cell")
    }
  }

  test("plan: equi-join on (key, cell) — no cartesian / nested-loop") {
    val plan = RangeJoin.pointInInterval(
      pts(("a", 1L, 10L)), ivs(("a", 2L, 0L, 20L)),
      Seq("k"), "p", "s", "e", cellNs = 7L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
