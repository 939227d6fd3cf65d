package graft.operators

import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.SparkSpec

/** Property test: [[PurgedSplit.purgedKFold]] against a driver-side
  * O(n·k) brute-force reference over random (k, H, E, ts multiset)
  * cases — including duplicate and NULL timestamps. The purge predicate
  * has four boundary inequalities (ts <= hi+H, ts+H >= lo, ts > hi+H,
  * ts <= hi+H+E); hand-computed goldens (PurgedSplitSpec) pin the happy
  * path, this pins the off-by-ones a fixture can miss.
  */
class PurgedSplitPropertySpec extends SparkSpec {

  /** Brute-force role surface: one (testFold, id, role) per (row, fold).
    * Mirrors the operator's documented contract literally:
    * - order by (ts ASC NULLS FIRST, id); pos*k div n is the fold;
    * - fold extents [lo, hi] from the fold's NON-NULL ts only;
    * - test: own fold; purged: ts <= hi+H && ts+H >= lo;
    *   embargo: hi+H < ts <= hi+H+E; train otherwise;
    * - NULL ts (and folds with no non-null ts) never purge/embargo. */
  private def reference(ts: Seq[Option[Long]], k: Int, h: Long, e: Long)
      : Set[(Long, Long, String)] = {
    val n = ts.size
    val order = ts.zipWithIndex
      .sortBy { case (t, id) => (t.isDefined, t.getOrElse(0L), id) }
    val folds = order.zipWithIndex.map { case ((t, id), pos) =>
      (id.toLong, t, pos.toLong * k / n)
    }
    val extent: Map[Long, Option[(Long, Long)]] = folds.groupBy(_._3)
      .map { case (f, rows) =>
        val live = rows.flatMap(_._2)
        f -> (if (live.isEmpty) None else Some((live.min, live.max)))
      }
    // role rows exist per NON-EMPTY fold only: with n < k the high folds
    // get no rows (pos*k div n never reaches them), so there is no fold
    // extent — and no test view — to emit against
    val liveFolds = folds.map(_._3).distinct.sorted
    (for {
      (id, t, own) <- folds
      tf <- liveFolds
    } yield {
      val role = (extent.getOrElse(tf, None), t) match {
        case _ if own == tf => "test"
        case (Some((lo, hi)), Some(v)) =>
          if (v <= hi + h && v + h >= lo) "purged"
          else if (v > hi + h && v <= hi + h + e) "embargo"
          else "train"
        case _ => "train" // null ts or all-null fold: nothing to overlap
      }
      (tf, id, role)
    }).toSet
  }

  test("purgedKFold matches the brute-force reference on 100+ random cases") {
    val genCase = for {
      n <- Gen.choose(1, 50)
      k <- Gen.choose(2, 6)
      h <- Gen.choose(0L, 40L)
      e <- Gen.choose(0L, 40L)
      // dense value range => duplicate timestamps are common; ~1 in 8
      // rows carries a NULL ts
      ts <- Gen.listOfN(n, Gen.frequency(
        7 -> Gen.choose(0L, 80L).map(Some(_)),
        1 -> Gen.const(Option.empty[Long])))
    } yield (ts, k, h, e)

    val prop = Prop.forAll(genCase) { case (ts, k, h, e) =>
      val rows = ts.zipWithIndex.map { case (t, id) =>
        Row(t.map(java.lang.Long.valueOf).orNull, id.toLong)
      }
      val input = df("ts_ns BIGINT, id BIGINT", rows: _*)
      val got = PurgedSplit
        .purgedKFold(input, "ts_ns", "id", k, h, e)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val want = reference(ts, k, h, e)
      if (got != want) {
        System.err.println(s"MISMATCH k=$k h=$h e=$e ts=$ts\n" +
          s"  only-engine: ${(got -- want).toSeq.sorted.take(8)}\n" +
          s"  only-ref:    ${(want -- got).toSeq.sorted.take(8)}")
      }
      got == want
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(110), prop)
    assert(res.passed, res.status.toString)
  }
}
