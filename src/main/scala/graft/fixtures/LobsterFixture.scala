package graft.fixtures

import java.sql.Date

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.{Ingest, Schema}

/** Deterministic synthetic LOBSTER ticker-day generator (FIXTURES.md §2
  * contract). Used by unit specs and the domain bench; NOT derived from any
  * real data. Guarantees, for `ticker="TEST", date=2024-01-15, seed=42`:
  *  - events 09:30-16:00 with activity concentrated 10:00-15:30;
  *  - >=1 timestamp with multiple events (event_number exercise);
  *  - iceberg boundary triplet: type-4 execs followed by a type-1 submit at
  *    the same price at +0.5ms / exactly +1ms / +1.2ms (inclusive 1ms
  *    tolerance edge, order_imbalance.py:35-43);
  *  - type-5 hidden execs at/inside/outside the spread (agg_ratio <=0,
  *    (0,1), >=1);
  *  - at least one empty 5-min bin inside the session;
  *  - sentinel quotes (one-sided book rows);
  *  - a duplicate event key (same event_time + event_number pattern via
  *    equal time_s values at different seq).
  */
object LobsterFixture {

  val Ticker = "TEST"
  val Day: Date = Date.valueOf("2024-01-15")

  /** Raw aligned message+quote rows (pre-prep event table without
    * event_time; call Prep.prepare / Ingest.withEventTime downstream). */
  def rawDay(spark: SparkSession, nEvents: Int = 2000, seed: Long = 42L)
      : DataFrame = {
    val rng = new scala.util.Random(seed)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    var mid = 1000000L // $100.0000 in LOBSTER ticks
    var oid = 1L
    var seq = 0L

    def quote(spreadTicks: Long = 200L): (Long, Long, Long, Long) = {
      val half = spreadTicks / 2
      (mid + half, 100L + rng.nextInt(900),
        mid - half, 100L + rng.nextInt(900))
    }
    def add(timeS: Double, et: Int, size: Long, price: Long, dir: Int,
            q: (Long, Long, Long, Long)): Unit = {
      rows += Row(timeS, et, oid, size, price, dir,
        q._1, q._2, q._3, q._4, Ticker, Day, seq)
      oid += 1; seq += 1
    }

    // background flow: 09:30-16:00, dense inside 10:00-15:30, leaving
    // (13:00, 13:05] empty for the densification check
    val sessionStart = 9 * 3600.0 + 1800.0
    val sessionEnd = 16 * 3600.0
    var t = sessionStart
    for (_ <- 1 to nEvents) {
      val inCore = t >= 36000.0 && t <= 55800.0
      val step = if (inCore) rng.nextDouble() * 18.0
                 else rng.nextDouble() * 90.0
      t = math.min(t + step + 1e-4, sessionEnd)
      if (t >= 46800.0 && t < 47100.0) t = 47100.0 // empty (13:00,13:05] bin
      mid += (rng.nextInt(7) - 3) * 100L
      val q = quote()
      val dir = if (rng.nextBoolean()) 1 else -1
      val et = rng.nextInt(10) match {
        case 0 | 1 | 2 | 3 => Schema.EventType.Submit
        case 4 | 5         => Schema.EventType.Delete
        case 6 | 7         => Schema.EventType.VisibleExec
        case 8             => Schema.EventType.HiddenExec
        case _             => Schema.EventType.PartialCancel
      }
      val price = et match {
        case 5 =>
          // hidden execs at/inside/outside the spread by turn
          rng.nextInt(3) match {
            case 0 => q._3                  // at bid: agg_ratio = 0
            case 1 => (q._1 + q._3) / 2     // inside
            case _ => q._1 + 100L           // above ask: agg_ratio > 1
          }
        case 4 => if (dir == -1) q._1 else q._3
        case _ => if (dir == 1) q._3 - rng.nextInt(3) * 100L
                  else q._1 + rng.nextInt(3) * 100L
      }
      add(t, et, 1L + rng.nextInt(500), price, dir, q)
    }

    // iceberg boundary triplet at 11:00 (inside core session)
    val base = 11 * 3600.0
    val p = mid + 300L
    val q0 = quote()
    add(base, Schema.EventType.VisibleExec, 100L, p, -1, q0)
    add(base + 0.0005, Schema.EventType.Submit, 100L, p, -1, q0)   // +0.5ms -> tagged
    add(base + 10.0, Schema.EventType.VisibleExec, 100L, p + 100L, -1, q0)
    add(base + 10.0 + 0.001, Schema.EventType.Submit, 100L, p + 100L, -1, q0) // exactly 1ms -> tagged (inclusive)
    add(base + 20.0, Schema.EventType.VisibleExec, 100L, p + 200L, -1, q0)
    add(base + 20.0 + 0.0012, Schema.EventType.Submit, 100L, p + 200L, -1, q0) // 1.2ms -> NOT tagged

    // same-timestamp burst (event_number) + duplicate key (same time, two
    // rows with identical timestamps at consecutive seq)
    val burst = 12 * 3600.0 + 0.123456
    val qb = quote()
    add(burst, Schema.EventType.Submit, 10L, mid - 100L, 1, qb)
    add(burst, Schema.EventType.Delete, 10L, mid - 100L, 1, qb)
    add(burst, Schema.EventType.VisibleExec, 10L, mid + 100L, -1, qb)

    // sentinel one-sided book rows
    add(14 * 3600.0, Schema.EventType.Submit, 50L, mid - 100L, 1,
      (Schema.NoAskSentinel, 0L, mid - 100L, 50L))
    add(14 * 3600.0 + 1.0, Schema.EventType.Submit, 50L, mid + 100L, -1,
      (mid + 100L, 50L, Schema.NoBidSentinel, 0L))

    val schema = StructType(
      Schema.rawMessage.fields.toSeq ++ Schema.rawQuoteL1.fields.toSeq ++
        Seq(StructField("ticker", StringType, nullable = false),
          StructField("date", DateType, nullable = false),
          StructField("seq", LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.toSeq.asJava, schema)
  }

  /** Prepped event table (event_time, session filter, event keys). */
  def preppedDay(spark: SparkSession, nEvents: Int = 2000,
                 seed: Long = 42L): DataFrame =
    graft.core.Prep.prepare(rawDay(spark, nEvents, seed))

  /** Event table without the session filter (full 09:30-16:00). */
  def fullDay(spark: SparkSession, nEvents: Int = 2000,
              seed: Long = 42L): DataFrame =
    graft.core.Prep.dropDuplicateKeys(graft.core.Prep.addEventKey(
      Ingest.withEventTime(rawDay(spark, nEvents, seed))))

  /** Multi-day prepped panel input: consecutive weekdays from `startDate`,
    * one independent synthetic day each (seed varies per day).
    *
    * Default density (4000 raw events) is chosen so the 10:00-15:30 core
    * session is covered end-to-end (~9 s mean inter-event step needs ~2200
    * events for the 19,800 s core; surplus events clamp at 16:00 and are
    * dropped by the session filter). At 1200 events the day exhausts near
    * 13:00 and every later 15-min bin is empty — pass a small `nEvents`
    * deliberately to exercise empty-bin/null-return semantics. */
  def preppedDays(spark: SparkSession, startDate: String, nDays: Int,
                  nEvents: Int = 4000, seed: Long = 42L): DataFrame = {
    var d = java.time.LocalDate.parse(startDate)
    val frames = (0 until nDays).map { i =>
      while (d.getDayOfWeek.getValue > 5) d = d.plusDays(1)
      val day = Date.valueOf(d)
      d = d.plusDays(1)
      val raw = rawDay(spark, nEvents, seed + i)
        .withColumn("date", org.apache.spark.sql.functions.lit(day))
      graft.core.Prep.prepare(raw)
    }
    frames.reduce(_ unionByName _)
  }
}
