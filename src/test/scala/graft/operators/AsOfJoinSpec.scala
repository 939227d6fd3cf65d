package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** J3: pandas merge_asof parity — forward/backward, by-keys, INCLUSIVE
  * tolerance, equal-timestamp matching (SURVEY §7.4.2). */
class AsOfJoinSpec extends SparkSpec {

  private def left(rows: Row*) = df("id BIGINT, k STRING, t BIGINT", rows: _*)
  private def right(rows: Row*) = df("k STRING, t BIGINT, v DOUBLE", rows: _*)

  test("forward: nearest following right row within same key") {
    val l = left(Row(1L, "a", 100L), Row(2L, "a", 250L), Row(3L, "b", 100L))
    val r = right(Row("a", 200L, 1.0), Row("a", 300L, 2.0),
      Row("b", 50L, 9.0))
    val out = AsOfJoin.forward(l, r, "t", Seq("k"), Seq("v"))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(3)) None else Some(x.getLong(3)))).toMap
    assert(out(1L).contains(200L))
    assert(out(2L).contains(300L))
    assert(out(3L).isEmpty) // only an earlier right row for key b
  }

  test("forward: equal timestamps match (pandas allow_exact_matches)") {
    val l = left(Row(1L, "a", 200L))
    val r = right(Row("a", 200L, 5.0))
    val out = AsOfJoin.forward(l, r, "t", Seq("k"), Seq("v")).collect()(0)
    assert(out.getLong(3) == 200L)
    assert(out.getDouble(4) == 5.0)
  }

  test("forward: tolerance is inclusive at the exact boundary") {
    val l = left(Row(1L, "a", 100L), Row(2L, "a", 500L))
    val r = right(Row("a", 200L, 1.0), Row("a", 700L, 2.0))
    // tol 100: row1 matches 200 (diff exactly 100); tol 100 for row2
    // excludes 700 (diff 200)
    val out = AsOfJoin.forward(l, r, "t", Seq("k"), Seq("v"),
        toleranceNs = Some(100L))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(3)) None else Some(x.getLong(3)))).toMap
    assert(out(1L).contains(200L))
    assert(out(2L).isEmpty)
  }

  test("backward: nearest preceding right row, inclusive tolerance") {
    val l = left(Row(1L, "a", 300L), Row(2L, "a", 90L))
    val r = right(Row("a", 200L, 1.0), Row("a", 280L, 2.0))
    val out = AsOfJoin.backward(l, r, "t", Seq("k"), Seq("v"),
        toleranceNs = Some(20L))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(3)) None else Some(x.getLong(3)))).toMap
    assert(out(1L).contains(280L)) // diff exactly 20 -> inclusive
    assert(out(2L).isEmpty)        // no right row at/before 90
  }

  test("attach columns come from the same matched row") {
    val l = left(Row(1L, "a", 100L))
    val r = right(Row("a", 150L, 7.0), Row("a", 160L, 8.0))
    val out = AsOfJoin.forward(l, r, "t", Seq("k"), Seq("v")).collect()(0)
    assert(out.getLong(3) == 150L && out.getDouble(4) == 7.0)
  }

  test("iceberg-tag shape: type-4 exec followed by type-1 within 1ms") {
    // LOBSTER semantics (order_imbalance.py:25-48): visible exec at price p
    // is an iceberg refill iff a new limit order at the same (ticker, price)
    // arrives within 1ms after it.
    val ms = 1000000L
    val ev = df("ticker STRING, price BIGINT, t BIGINT, event_type INT",
      Row("X", 100L, 0L, 4), Row("X", 100L, ms / 2, 1),        // tagged
      Row("X", 200L, 0L, 4), Row("X", 200L, 2 * ms, 1),        // too late
      Row("X", 300L, 0L, 4), Row("Y", 300L, ms / 2, 1))        // wrong key
    val execs = ev.filter(col("event_type") === 4)
    val news = ev.filter(col("event_type") === 1)
    val tagged = AsOfJoin.forward(execs, news, "t",
        Seq("ticker", "price"), Nil, toleranceNs = Some(ms))
      .withColumn("iceberg", col("asof_time").isNotNull.cast("int"))
    val out = tagged.collect()
      .map(r => r.getLong(1) -> r.getInt(r.length - 1)).toMap
    assert(out == Map(100L -> 1, 200L -> 0, 300L -> 0))
  }
}
