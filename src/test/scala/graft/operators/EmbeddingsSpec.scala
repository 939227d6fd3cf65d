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
}
