package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver TESTDATA star schema (TESTDATA.md).
  *
  * Each table is a single parquet file under `dir` (one of
  * /root/testdata/sf{0.001,0.01,0.1}). At cluster scale these would be
  * partitioned parquet/Iceberg tables; the loader signature (dir + name)
  * stays identical, so all operators are written against DataFrames and
  * never assume single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Historically events.ts was parquet TIMESTAMP(NANOS), which Spark's
    // reader rejects unless read as LongType epoch-nanos (and epoch-nanos
    // ~1.7e18 exceed Double's 2^53, so Long is also the correct carrier).
    // Current testdata writes TIMESTAMP(MICROS); nanosAsLong is a no-op
    // there and stays set only for legacy NANOS layouts. Consumers must
    // normalize through [[tsToNs]] rather than assume either layout.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Normalize an events frame's `ts` column — either legacy epoch-ns
    * LONG (parquet TIMESTAMP(NANOS) read via nanosAsLong) or a
    * TIMESTAMP/TIMESTAMP_NTZ micros column (current testdata layout) —
    * to epoch-ns LONG truncated to whole microseconds. Truncation keeps
    * both layouts bit-identical to the DuckDB oracle's
    * `(epoch_ns(ts) // 1000) * 1000` (DuckDB reads NANOS parquet at µs
    * precision, so sub-µs nanos exist only on the legacy Spark side).
    * NTZ wall-clock is interpreted in the session time zone, which every
    * entrypoint pins to UTC — matching DuckDB's naive-as-UTC epoch_ns.
    * Works on batch and streaming frames alike (pure projection).
    */
  def tsToNs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType =>
      df.withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
    case TimestampType | TimestampNTZType =>
      df.withColumn("ts",
        unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    case other =>
      throw new IllegalArgumentException(
        s"events.ts has unsupported type $other; expected LONG epoch-ns " +
          "or TIMESTAMP/TIMESTAMP_NTZ micros")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
