package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    // unless read as LongType epoch-nanos. Reading nanos as Long is also
    // the right call for correctness: epoch-nanos (~1.7e18) exceed
    // Double's 2^53 exact range, and truncating to micros would lose the
    // sub-microsecond order the as-of/window operators depend on.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
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
