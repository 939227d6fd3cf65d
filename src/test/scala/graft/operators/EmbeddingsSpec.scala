package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class EmbeddingsSpec extends SparkSpec {

  private def vecs() = df("id BIGINT, g STRING, v ARRAY<FLOAT>",
    Row(1L, "a", Seq(3.0f, 4.0f)),
    Row(2L, "a", Seq(1.0f, 0.0f)),
    Row(3L, "b", Seq(0.0f, 0.0f)),
    Row(4L, "b", Seq(2.0f, 6.0f)))

  test("normalizeL2: unit vectors, zero vector maps to zeros") {
    val out = vecs().select(col("id"),
        Embeddings.normalizeL2(col("v")).as("u"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assertApprox(out(1L)(0), 0.6)
    assertApprox(out(1L)(1), 0.8)
    assert(out(3L) == Seq(0.0, 0.0))
    out.filter(_._1 != 3L).values.foreach { u =>
      assertApprox(math.sqrt(u.map(x => x * x).sum), 1.0)
    }
  }

  test("meanPoolLong: per-group per-dim means, stable under " +
    "repartitioning") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Embeddings.meanPoolLong(d, Seq("g"), "v")
        .collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val m = run(vecs())
    assertApprox(m(("a", 0)), 2.0)
    assertApprox(m(("a", 1)), 2.0)
    assertApprox(m(("b", 0)), 1.0)
    assertApprox(m(("b", 1)), 3.0)
    assert(m == run(vecs().repartition(7)), "means drift under layout")
  }

  test("meanPool wide face equals the long format, dims in order") {
    val wide = Embeddings.meanPool(vecs(), Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(wide("a") == Seq(2.0, 2.0))
    assert(wide("b") == Seq(1.0, 3.0))
  }

  test("pcaProject: k dims out, first component captures the dominant " +
    "spread, deterministic within a session") {
    // points spread along (1, 1, 0) with small noise on the third axis
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      val t = rnd.nextGaussian() * 10
      Row(i.toLong, Seq(t.toFloat, t.toFloat,
        (rnd.nextGaussian() * 0.1).toFloat))
    }
    val d = df("id BIGINT, v ARRAY<FLOAT>", rows: _*)
    val p = Embeddings.pcaProject(d, Seq("id"), "v", k = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p.values.forall(_.length == 2))
    def variance(xs: Iterable[Double]): Double = {
      val mean = xs.sum / xs.size
      xs.map(x => (x - mean) * (x - mean)).sum / xs.size
    }
    val v0 = variance(p.values.map(_(0)))
    val v1 = variance(p.values.map(_(1)))
    assert(v0 > 100 * v1, s"first component not dominant: $v0 vs $v1")
    val again = Embeddings.pcaProject(d, Seq("id"), "v", k = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    p.foreach { case (id, vec) =>
      vec.zip(again(id)).foreach { case (a, b) => assertApprox(a, b) }
    }
  }

  test("pcaPowerProject: matches the anisotropy pcaProject finds, " +
    "canonical sign, layout-stable to the bit") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      val t = rnd.nextGaussian() * 10
      Row(i.toLong, Seq(t.toFloat, t.toFloat,
        (rnd.nextGaussian() * 0.1).toFloat))
    }
    val d = df("id BIGINT, v ARRAY<FLOAT>", rows: _*)
    def run(in: org.apache.spark.sql.DataFrame) =
      Embeddings.pcaPowerProject(in, "id", "v", k = 2, iters = 8)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2))
        .toMap
    val p = run(d)
    def variance(xs: Iterable[Double]): Double = {
      val mean = xs.sum / xs.size
      xs.map(x => (x - mean) * (x - mean)).sum / xs.size
    }
    val byComp = p.groupBy(_._1._2).view.mapValues(_.values).toMap
    // the (1,1,0) spread dominates; component 0 must capture it
    assert(variance(byComp(0)) > 100 * variance(byComp(1)),
      "first power-iteration component not dominant")
    // canonical sign: projections of the dominant direction correlate
    // POSITIVELY with the generating t (largest |loading| is positive,
    // and the loading vector is ~(+.707, +.707, ~0))
    val t5 = rows(4).getSeq[Float](1).head.toDouble
    val proj5 = p((5L, 0))
    assert(math.signum(proj5) == math.signum(t5 * 1.414) ||
      math.abs(t5) < 1e-6, s"sign not canonical: t=$t5 proj=$proj5")
    // bit-stable under a different layout (the decimal-sum guarantee)
    assert(p == run(d.repartition(7)), "projections drift under layout")
  }

  test("quantizeInt8: codes span the full [-128, 127] range and " +
    "dequantize within step/2 per element") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 50).map { i =>
      Row(i.toLong, Seq.fill(16)((rnd.nextGaussian() * 3).toFloat))
    }
    val d = df("id BIGINT, v ARRAY<FLOAT>", rows: _*)
    val out = d.select(col("id"),
        transform(col("v"), x => x.cast("double")).as("orig"),
        Embeddings.quantizeInt8(col("v")).as("qz"))
      .select(col("id"), col("orig"),
        col("qz").getField("lo").as("lo"),
        col("qz").getField("step").as("step"),
        col("qz").getField("q").as("q"),
        Embeddings.dequantizeInt8(col("qz")).as("deq"))
      .collect()
    out.foreach { r =>
      val orig = r.getSeq[Double](1)
      val step = r.getDouble(3)
      val q = r.getSeq[Byte](4)
      val deq = r.getSeq[Double](5)
      assert(q.min == -128 && q.max == 127) // min and max hit the rails
      orig.zip(deq).foreach { case (o, dq) =>
        assert(math.abs(o - dq) <= step / 2 + 1e-12,
          s"error ${math.abs(o - dq)} > step/2 ${step / 2}")
      }
    }
  }

  test("quantizeInt8: constant vector has step 0 and dequantizes " +
    "exactly; empty vector stays empty") {
    val d = df("id BIGINT, v ARRAY<FLOAT>",
      Row(1L, Seq(2.5f, 2.5f, 2.5f)), Row(2L, Seq.empty[Float]))
    val out = d.select(col("id"),
        Embeddings.quantizeInt8(col("v")).as("qz"))
      .select(col("id"), col("qz").getField("step").as("step"),
        Embeddings.dequantizeInt8(col("qz")).as("deq"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          r.getSeq[Double](2)))).toMap
    assert(out(1L)._1.contains(0.0))
    assert(out(1L)._2.forall(x => x == 2.5))
    // empty vector: no min/max exists (null lo/step), empty codes, and
    // the reconstruction is the empty vector again
    assert(out(2L)._1.isEmpty && out(2L)._2.isEmpty)
  }

  test("quantized brute-force ANN: recall@3 >= 0.9 vs exact on the " +
    "dequantized vectors") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 120).map { i =>
      Row(i.toLong, Seq.fill(24)((rnd.nextGaussian()).toFloat))
    }
    val d = df("id BIGINT, v ARRAY<FLOAT>", rows: _*)
    val exact = Similarity.bruteForceTopK(
        d.filter(col("id") <= 5), d, "id", "id", "v", "v", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val dq = d.select(col("id"),
      Embeddings.dequantizeInt8(Embeddings.quantizeInt8(col("v")))
        .as("v"))
    val approxTopK = Similarity.bruteForceTopK(
        dq.filter(col("id") <= 5), dq, "id", "id", "v", "v", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.map { case (q, ids) =>
      ids.intersect(approxTopK(q)).size.toDouble / ids.size
    }.sum / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }
}
