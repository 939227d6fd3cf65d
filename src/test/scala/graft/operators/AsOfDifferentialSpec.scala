package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Differential test: AsOfJoin vs a brute-force O(n*m) reference
  * implementation of pandas merge_asof semantics, over randomized inputs
  * with engineered ties and boundary gaps. The brute force is independent
  * Scala (no Spark), so agreement is strong evidence of the union+window
  * formulation's correctness. */
class AsOfDifferentialSpec extends SparkSpec {

  private case class L(id: Long, k: String, t: Long)
  private case class R(k: String, t: Long, v: Double)

  private def bruteForward(ls: Seq[L], rs: Seq[R], tol: Option[Long])
      : Map[Long, Option[Long]] =
    ls.map { l =>
      val cands = rs.filter(r => r.k == l.k && r.t >= l.t)
        .filter(r => tol.forall(tt => r.t - l.t <= tt))
      l.id -> (if (cands.isEmpty) None else Some(cands.map(_.t).min))
    }.toMap

  private def bruteBackward(ls: Seq[L], rs: Seq[R], tol: Option[Long])
      : Map[Long, Option[Long]] =
    ls.map { l =>
      val cands = rs.filter(r => r.k == l.k && r.t <= l.t)
        .filter(r => tol.forall(tt => l.t - r.t <= tt))
      l.id -> (if (cands.isEmpty) None else Some(cands.map(_.t).max))
    }.toMap

  /** Returns the number of matches that sit EXACTLY at the tolerance
    * boundary — the SURVEY §7.4 #2 trap (inclusive vs exclusive
    * tolerance). The tight-tolerance tests assert this is non-zero so
    * a generator change can never silently drop the boundary-collision
    * coverage this spec exists for. */
  private def run(seed: Int, forward: Boolean, tol: Option[Long]): Long = {
    val rng = new scala.util.Random(seed)
    val keys = Seq("a", "b", "c")
    // timestamps on a coarse grid => many exact ties and exact-tolerance
    // boundaries
    val ls = (1 to 120).map(i =>
      L(i.toLong, keys(rng.nextInt(3)), rng.nextInt(50) * 10L))
    val rs = (1 to 80).map(i =>
      R(keys(rng.nextInt(3)), rng.nextInt(50) * 10L, i.toDouble))
    val lDf = df("id BIGINT, k STRING, t BIGINT",
      ls.map(l => Row(l.id, l.k, l.t)): _*)
    val rDf = df("k STRING, t BIGINT, v DOUBLE",
      rs.map(r => Row(r.k, r.t, r.v)): _*)
    val out = (if (forward)
      AsOfJoin.forward(lDf, rDf, "t", Seq("k"), Seq("v"), tol)
    else AsOfJoin.backward(lDf, rDf, "t", Seq("k"), Seq("v"), tol))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val expect = if (forward) bruteForward(ls, rs, tol)
                 else bruteBackward(ls, rs, tol)
    ls.foreach { l =>
      assert(out(l.id) == expect(l.id),
        s"seed=$seed fwd=$forward tol=$tol id=${l.id} k=${l.k} t=${l.t}: " +
          s"got ${out(l.id)}, want ${expect(l.id)}")
    }
    tol.fold(0L) { tt =>
      ls.count { l =>
        expect(l.id).exists(mt =>
          (if (forward) mt - l.t else l.t - mt) == tt)
      }.toLong
    }
  }

  test("forward, unbounded tolerance, randomized (3 seeds)") {
    Seq(1, 2, 3).foreach(s => run(s, forward = true, None))
  }

  test("forward, tight tolerance incl. exact boundary (3 seeds)") {
    val boundaryHits = Seq(4, 5, 6).map(s => run(s, forward = true,
      Some(20L))).sum
    assert(boundaryHits > 0, "generator produced NO exact-tolerance " +
      "matches — the boundary-collision coverage this spec exists for " +
      "is gone; re-align the ts grid with the tolerance")
  }

  test("backward, unbounded tolerance (3 seeds)") {
    Seq(7, 8, 9).foreach(s => run(s, forward = false, None))
  }

  test("backward, tight tolerance (3 seeds)") {
    val boundaryHits = Seq(10, 11, 12).map(s => run(s, forward = false,
      Some(10L))).sum
    assert(boundaryHits > 0, "generator produced NO exact-tolerance " +
      "matches — the boundary-collision coverage this spec exists for " +
      "is gone; re-align the ts grid with the tolerance")
  }
}
