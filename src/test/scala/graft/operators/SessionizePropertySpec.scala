package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.SparkSpec

/** Property test: [[Sessionize.withSessionId]] and
  * [[Sessionize.transitions]] against a driver-side brute-force
  * reference over random event streams with ENGINEERED gap boundaries —
  * the generator draws timestamps on a grid aligned with the gap so
  * `gap == gapNs` (same session, strict >) and `gap == gapNs + 1`
  * (split) both occur constantly — plus duplicate timestamps (id
  * tie-break, gap 0) and NULL timestamps.
  *
  * The NULL contract mirrored here is the operator's actual window
  * semantics (ASC NULLS FIRST): null-ts rows sort before everything,
  * and each one starts its own session (its lag is absent or null);
  * the first non-null row then also starts fresh. Transitions drop any
  * pair involving a null timestamp (the gap predicate is null).
  */
class SessionizePropertySpec extends SparkSpec {

  private case class E(id: Long, k: String, ts: Option[Long], step: String)

  /** (id -> session_id) per the gaps-and-islands rule over
    * (ts ASC NULLS FIRST, id). */
  private def refSessions(es: Seq[E], gap: Long): Map[Long, Long] =
    es.groupBy(_.k).flatMap { case (_, g) =>
      val order = g.sortBy(e => (e.ts.isDefined, e.ts.getOrElse(0L), e.id))
      var sid = -1L
      var prev: Option[Option[Long]] = None
      order.map { e =>
        val start = prev match {
          case None => true                  // first row of the key
          case Some(None) => true            // previous ts was NULL
          case Some(Some(p)) => e.ts match {
            case Some(t) => t - p > gap
            case None => false               // can't happen: nulls first
          }
        }
        if (start) sid += 1
        prev = Some(e.ts)
        e.id -> sid
      }
    }

  /** (from, to) -> count of consecutive same-key pairs within gap. */
  private def refTransitions(es: Seq[E], gap: Long)
      : Map[(String, String), Long] =
    es.groupBy(_.k).toSeq.flatMap { case (_, g) =>
      val order = g.sortBy(e => (e.ts.isDefined, e.ts.getOrElse(0L), e.id))
      order.zip(order.drop(1)).flatMap { case (a, b) =>
        (a.ts, b.ts) match {
          case (Some(x), Some(y)) if y - x <= gap =>
            Some((a.step, b.step))
          case _ => None
        }
      }
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }

  test("withSessionId + transitions match brute force on 100+ cases " +
    "with exact-gap boundaries, ties, and NULL timestamps") {
    val genCase = for {
      gapUnits <- Gen.choose(1L, 5L)
      unit <- Gen.choose(1L, 10L)
      n <- Gen.choose(1, 45)
      nKeys <- Gen.choose(1, 3)
      // grid-aligned draws: consecutive deltas are multiples of `unit`,
      // so gaps hit gapNs EXACTLY all the time; ~1 in 10 ts is NULL
      ts <- Gen.listOfN(n, Gen.frequency(
        9 -> Gen.choose(0L, 12L).map(u => Some(u * unit)),
        1 -> Gen.const(Option.empty[Long])))
      ks <- Gen.listOfN(n, Gen.choose(0, nKeys - 1))
      steps <- Gen.listOfN(n, Gen.oneOf("view", "click", "buy"))
    } yield {
      val es = ts.zip(ks).zip(steps).zipWithIndex.map {
        case (((t, k), s), i) => E(i.toLong, s"k$k", t, s)
      }
      (es, gapUnits * unit)
    }

    val prop = Prop.forAll(genCase) { case (es, gap) =>
      val input = df("id BIGINT, k STRING, ts BIGINT, step STRING",
        es.map(e => Row(e.id, e.k,
          e.ts.map(java.lang.Long.valueOf).orNull, e.step)): _*)
      val gotS = Sessionize.withSessionId(input, Seq("k"), "ts", gap, "id")
        .select("id", "session_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val wantS = refSessions(es, gap)
      val gotT = Sessionize.transitions(input, Seq("k"), "ts", "step",
          gap, "id")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val wantT = refTransitions(es, gap)
      if (gotS != wantS || gotT != wantT) {
        System.err.println(s"MISMATCH gap=$gap es=$es\n" +
          s"  sessions engine=$gotS\n  sessions ref=$wantS\n" +
          s"  transitions engine=$gotT\n  transitions ref=$wantT")
      }
      gotS == wantS && gotT == wantT
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(110), prop)
    assert(res.passed, res.status.toString)
  }
}
