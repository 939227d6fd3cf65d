package graft.core

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Dual-layout ingest canary for [[Tables.tsToNs]].
  *
  * The driver's testdata has shipped `events.ts` in two layouts so far:
  * parquet TIMESTAMP(NANOS), which Spark reads as LONG epoch-ns under
  * `spark.sql.legacy.parquet.nanosAsLong`, and TIMESTAMP(MICROS), which
  * reads as TimestampType. A layout flip from the first to the second
  * silently broke 57 gates in round 10; `tsToNs` is the single
  * normalization choke point that now absorbs both. The current testdata
  * is µs, which leaves the legacy LONG branch with zero coverage from the
  * driver gates — exactly the dead-branch condition that produced the
  * round-10 breakage in the other direction. This spec keeps BOTH
  * branches pinned: the same five instants are written as LONG epoch-ns
  * and as TIMESTAMP(MICROS) parquet fixtures, and `tsToNs` must yield the
  * identical µs-truncated epoch-ns LONG column for each.
  */
class TablesSpec extends SparkSpec {

  // epoch-ns instants straddling a µs boundary: the sub-µs tail (last 3
  // digits) exists only in the legacy NANOS layout and MUST be truncated
  // away for the layouts to agree (DuckDB reads NANOS parquet at µs).
  private val instantsNs = Seq(
    0L,
    1L,                          // sub-µs only: truncates to 0
    999L,                        // just under 1 µs: truncates to 0
    1700000000123456789L,        // 2023-11-14..., ns tail 789
    1700000000123456000L)        // same µs, no ns tail

  private val expectedNs = instantsNs.map(n => n - n % 1000L)

  private def writeFixture(rows: Seq[Row], schema: StructType): String = {
    val dir = Files.createTempDirectory("graft_ts_canary_").toString
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  private def normalized(dir: String): Seq[(Long, Long)] = {
    val out = Tables.tsToNs(spark.read.parquet(dir))
    assert(out.schema("ts").dataType == LongType,
      "tsToNs must yield a LONG epoch-ns column")
    out.select(col("id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
  }

  test("legacy LONG epoch-ns layout normalizes to µs-truncated epoch-ns") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("ts", LongType)))
    val dir = writeFixture(
      instantsNs.zipWithIndex.map { case (ns, i) => Row(i.toLong, ns) },
      schema)
    assert(normalized(dir) ==
      expectedNs.zipWithIndex.map { case (ns, i) => (i.toLong, ns) })
  }

  test("TIMESTAMP(MICROS) layout normalizes to the identical column") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("ts", TimestampType)))
    val dir = writeFixture(
      instantsNs.zipWithIndex.map { case (ns, i) =>
        // the µs layout can only carry whole microseconds — same truncation
        // the parquet writer would apply
        Row(i.toLong, java.sql.Timestamp.from(
          java.time.Instant.EPOCH.plusNanos(ns - ns % 1000L)))
      }, schema)
    assert(normalized(dir) ==
      expectedNs.zipWithIndex.map { case (ns, i) => (i.toLong, ns) })
  }

  test("TIMESTAMP_NTZ layout (UTC session) normalizes identically") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("ts", TimestampNTZType)))
    val dir = writeFixture(
      instantsNs.zipWithIndex.map { case (ns, i) =>
        Row(i.toLong, java.time.LocalDateTime.ofInstant(
          java.time.Instant.EPOCH.plusNanos(ns - ns % 1000L),
          java.time.ZoneOffset.UTC))
      }, schema)
    assert(normalized(dir) ==
      expectedNs.zipWithIndex.map { case (ns, i) => (i.toLong, ns) })
  }

  test("the two parquet layouts agree bit-for-bit after normalization") {
    val longDir = writeFixture(
      instantsNs.zipWithIndex.map { case (ns, i) => Row(i.toLong, ns) },
      StructType(Seq(StructField("id", LongType),
        StructField("ts", LongType))))
    val microsDir = writeFixture(
      instantsNs.zipWithIndex.map { case (ns, i) =>
        Row(i.toLong, java.sql.Timestamp.from(
          java.time.Instant.EPOCH.plusNanos(ns - ns % 1000L)))
      }, StructType(Seq(StructField("id", LongType),
        StructField("ts", TimestampType))))
    assert(normalized(longDir) == normalized(microsDir))
  }

  test("an unsupported ts type fails loudly, not silently") {
    val bad = df("id LONG, ts STRING", Row(1L, "2024-01-01"))
    val e = intercept[IllegalArgumentException](Tables.tsToNs(bad))
    assert(e.getMessage.contains("unsupported type"))
  }

  test("events loader + tsToNs round-trips the driver testdata") {
    // whatever layout the driver ships, the normalized column must be
    // LONG epoch-ns on whole microseconds
    val ev = Tables.tsToNs(
      Tables.events(spark, "/root/testdata/sf0.001"))
    assert(ev.schema("ts").dataType == LongType)
    val sample = ev.select(col("ts")).limit(100).collect().map(_.getLong(0))
    assert(sample.nonEmpty && sample.forall(_ % 1000L == 0L))
  }
}
