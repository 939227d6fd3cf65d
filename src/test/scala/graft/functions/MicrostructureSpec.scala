package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class MicrostructureSpec extends SparkSpec {

  test("midprice / spread / ofi / weighted midprice") {
    val d = df("ask DOUBLE, bid DOUBLE, asz DOUBLE, bsz DOUBLE",
      Row(101.0, 99.0, 10.0, 30.0))
    val r = d.select(
      Microstructure.midprice(col("ask"), col("bid")),
      Microstructure.spread(col("ask"), col("bid")),
      Microstructure.ofi(col("bsz"), col("asz")),
      Microstructure.weightedMidprice(col("ask"), col("bid"), col("asz"),
        col("bsz"))).collect()(0)
    assertApprox(r.getDouble(0), 100.0)
    assertApprox(r.getDouble(1), 2.0)
    assertApprox(r.getDouble(2), 0.5)        // (30-10)/40
    assertApprox(r.getDouble(3), 0.75 * 101.0 + 0.25 * 99.0) // w = 30/40
  }

  test("ofi NULL when both sizes zero") {
    val d = df("asz DOUBLE, bsz DOUBLE", Row(0.0, 0.0))
    assert(d.select(Microstructure.ofi(col("bsz"), col("asz")))
      .collect()(0).isNullAt(0))
  }

  test("aggRatio: at bid 0, at ask 1, outside spread <0 or >1") {
    val d = df("p DOUBLE, ask DOUBLE, bid DOUBLE",
      Row(99.0, 101.0, 99.0), Row(101.0, 101.0, 99.0),
      Row(98.0, 101.0, 99.0), Row(102.0, 101.0, 99.0))
    val out = d.select(Microstructure.aggRatio(col("p"), col("ask"),
      col("bid"))).collect().map(_.getDouble(0))
    assertApprox(out(0), 0.0); assertApprox(out(1), 1.0)
    assert(out(2) < 0.0 && out(3) > 1.0)
  }

  test("signedSize: np.select semantics by event type") {
    val d = df("et INT, dir INT, size BIGINT",
      Row(1, 1, 10L), Row(4, -1, 10L), Row(3, 1, 10L), Row(5, 1, 10L))
    val out = d.select(Microstructure.signedSize(col("et"), col("dir"),
      col("size"))).collect().map(_.getLong(0))
    assert(out.sameElements(Array(10L, -10L, -10L, 0L)))
  }

  test("validQuote filters LOBSTER sentinels") {
    val d = df("ask BIGINT, bid BIGINT",
      Row(1010000L, 990000L), Row(9999999999L, 990000L),
      Row(1010000L, -9999999999L))
    val out = d.select(Microstructure.validQuote(col("ask"), col("bid")))
      .collect().map(_.getBoolean(0))
    assert(out.sameElements(Array(true, false, false)))
  }

  test("contOfi: Cont quote-change e_n — up/down/zero changes and the " +
      "NULL first observation") {
    // (bid, ask, bsz, asz, p_bid, p_ask, p_bsz, p_asz)
    val d = df("bid DOUBLE, ask DOUBLE, bsz DOUBLE, asz DOUBLE, " +
      "pbid DOUBLE, pask DOUBLE, pbsz DOUBLE, pasz DOUBLE",
      // bid up (+bsz), ask up (+p_asz): e = 10 - 0 - 0 + 4 = 14
      Row(100.0, 101.0, 10.0, 3.0, 99.0, 100.5, 7.0, 4.0),
      // bid down (-p_bsz), ask down (-asz): e = 0 - 7 - 3 + 0 = -10
      Row(99.0, 100.0, 10.0, 3.0, 100.0, 101.0, 7.0, 4.0),
      // both unchanged: both indicators fire per side
      // e = 10 - 7 - 3 + 4 = 4  (pure size deltas)
      Row(100.0, 101.0, 10.0, 3.0, 100.0, 101.0, 7.0, 4.0),
      // first observation: null prevs -> NULL (pandas 0 * NaN = NaN twin)
      Row(100.0, 101.0, 10.0, 3.0, null, null, null, null))
    val out = d.select(Microstructure.contOfi(col("bid"), col("ask"),
      col("bsz"), col("asz"), col("pbid"), col("pask"),
      col("pbsz"), col("pasz"))).collect()
    assertApprox(out(0).getDouble(0), 14.0)
    assertApprox(out(1).getDouble(0), -10.0)
    assertApprox(out(2).getDouble(0), 4.0)
    assert(out(3).isNullAt(0))
  }

  test("logReturn: NULL on null/zero prev, else ln(cur/prev)") {
    val d = df("cur DOUBLE, prev DOUBLE",
      Row(110.0, 100.0), Row(110.0, null), Row(110.0, 0.0))
    val rows = d.select(Microstructure.logReturn(col("cur"), col("prev")))
      .collect()
    assertApprox(rows(0).getDouble(0), math.log(1.1))
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(0))
  }
}
