package graft.sources

import org.apache.spark.sql.Row
import graft.SparkSpec

/** S7 retry-adapter shape (`order_imbalance.py:51-81`): bounded
  * attempts, inter-attempt delay, loud failure carrying the last
  * cause. */
class RetrySpec extends SparkSpec {

  test("fetchWithRetry: succeeds on attempt N after N-1 failures, " +
    "sleeping between attempts") {
    val d = df("x BIGINT", Row(1L))
    var calls = 0
    var sleeps = List.empty[Long]
    val out = AuxSources.fetchWithRetry(
      () => {
        calls += 1
        if (calls < 3) sys.error(s"transient failure $calls")
        d
      },
      maxAttempts = 10, delayMs = 5000L, sleep = ms => sleeps ::= ms)
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(calls == 3, "two failures then success")
    assert(sleeps == List(5000L, 5000L),
      "one delay per failed attempt, none after success")
  }

  test("fetchWithRetry: gives up loudly after maxAttempts with the " +
    "last cause, and does not sleep after the final failure") {
    var calls = 0
    var sleeps = 0
    val e = intercept[RuntimeException] {
      AuxSources.fetchWithRetry(
        () => { calls += 1; sys.error(s"down $calls") },
        maxAttempts = 4, delayMs = 1L, sleep = _ => sleeps += 1)
    }
    assert(calls == 4)
    assert(sleeps == 3, "no sleep after the last attempt")
    assert(e.getMessage.contains("after 4 attempts"))
    assert(e.getCause != null && e.getCause.getMessage.contains("down 4"))
  }

  test("fetchWithRetry: first-try success never sleeps") {
    val d = df("x BIGINT", Row(7L))
    var sleeps = 0
    val out = AuxSources.fetchWithRetry(() => d, sleep = _ => sleeps += 1)
    assert(out.count() == 1L && sleeps == 0)
  }
}
