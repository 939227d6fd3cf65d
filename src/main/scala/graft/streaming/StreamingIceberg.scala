package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming iceberg-refill detection — the Structured-Streaming twin of
  * the batch as-of self-join (J3, `/root/reference/order_imbalance.py:
  * 25-48`): a visible execution (type 4) is an iceberg refill iff a new
  * limit order (type 1) at the same (ticker, price) arrives within the
  * tolerance AFTER it.
  *
  * State machine per (ticker, price) key via flatMapGroupsWithState +
  * event-time timeout:
  *  - type-4 rows join the pending list;
  *  - type-1 rows resolve every pending exec within tolerance => emit
  *    `iceberg = 1` immediately;
  *  - when the watermark passes `exec_time + tolerance`, unresolved
  *    pending execs can no longer match => emit `iceberg = 0` on timeout
  *    (or on any later batch for the group).
  *
  * State is O(pending execs inside one tolerance window per key) — with a
  * 1 ms tolerance, effectively a handful of rows; bounded regardless of
  * stream length. Output is append-only and exactly mirrors the batch
  * semantics (differentially tested in the spec).
  */
object StreamingIceberg {

  final case class Exec(execId: Long, ticker: String, price: Long,
                        tsNs: Long)
  final case class In(execId: Long, ticker: String, price: Long,
                      tsNs: Long, eventType: Int,
                      event_time: java.sql.Timestamp)
  final case class PendingState(pending: List[Exec])
  final case class Tagged(execId: Long, ticker: String, price: Long,
                          tsNs: Long, iceberg: Int)

  /** @param events streaming DF with (event_time TIMESTAMP, event_id,
    *               ticker, price, ts_ns, event_type)
    * @param toleranceNs inclusive forward tolerance in nanos */
  def tagStream(events: DataFrame, toleranceNs: Long,
                watermark: String = "10 seconds"): Dataset[Tagged] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("event_time", watermark)
      .select(col("event_id").cast("long").as("execId"),
        col("ticker").cast("string").as("ticker"),
        col("price").cast("long").as("price"),
        col("ts_ns").cast("long").as("tsNs"),
        col("event_type").cast("int").as("eventType"),
        // the watermarked column itself must flow into the typed Dataset
        // for EventTimeTimeout to resolve
        col("event_time"))
      .as[In]

    typed.groupByKey(r => (r.ticker, r.price))
      .flatMapGroupsWithState[PendingState, Tagged](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((ticker, price), rows, state: GroupState[PendingState]) =>
          val prev = state.getOption.map(_.pending).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[Tagged]
          var pending = prev

          if (!state.hasTimedOut) {
            // event-time order within the batch; type 4 before type 1 at
            // equal timestamps — the forward window is INCLUSIVE of a
            // same-instant submit, so the exec must already be pending
            // when that submit processes (batch as-of parity)
            val sorted = rows.toSeq.sortBy(r =>
              (r.tsNs, -r.eventType, r.execId))
            sorted.foreach { r =>
              if (r.eventType == 4) {
                pending = pending :+ Exec(r.execId, ticker, price, r.tsNs)
              } else if (r.eventType == 1) {
                val (hit, miss) = pending.partition(p =>
                  r.tsNs >= p.tsNs && r.tsNs - p.tsNs <= toleranceNs)
                hit.foreach(p =>
                  out += Tagged(p.execId, ticker, price, p.tsNs, 1))
                // pending execs whose window already closed before this
                // submit can never match anymore
                val (dead, alive) = miss.partition(p =>
                  r.tsNs - p.tsNs > toleranceNs)
                dead.foreach(p =>
                  out += Tagged(p.execId, ticker, price, p.tsNs, 0))
                pending = alive
              }
            }
          }
          // expire pending execs the watermark has passed (no future
          // submit can be within tolerance anymore)
          val wmMs = state.getCurrentWatermarkMs()
          if (wmMs > 0) {
            val (dead, alive) = pending.partition(p =>
              p.tsNs / 1000000L + toleranceNs / 1000000L < wmMs)
            dead.foreach(p =>
              out += Tagged(p.execId, ticker, price, p.tsNs, 0))
            pending = alive
          }
          if (pending.isEmpty) state.remove()
          else {
            state.update(PendingState(pending))
            // wake up when the earliest pending exec's window closes
            val earliest = pending.map(_.tsNs).min / 1000000L
            state.setTimeoutTimestamp(
              earliest + toleranceNs / 1000000L + 1)
          }
          out.iterator
      }
  }
}
