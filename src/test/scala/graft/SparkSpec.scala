package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM per forked test run). */
object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Tripwire: a whole-stage-codegen compile failure must FAIL the
      // suite, not silently fall back to interpreted execution (r12: the
      // BPE hashAgg unit blew the Janino budget and ran un-codegen'd with
      // green tests — a 5-10x scan-speed loss only visible at scale).
      // SparkEntrySpec runs every gate query, so this guards all of them.
      .config("spark.sql.codegen.fallback", "false")
      // Tripwire 2 (r16): storage hygiene must be EXPLICIT, never GC
      // luck. ContextCleaner frees unreferenced RDD blocks whenever the
      // driver happens to GC — which is why the r15 checkpoint leak
      // passed every small-heap test and only surfaced at 64x data on a
      // big heap. With reference tracking off, a frame freed by nothing
      // but GC stays pinned, so SoakSpec/LineageSpec assertions are
      // deterministic in both directions. Test-session only; the
      // Verify/Bench mains keep the default cleaner.
      .config("spark.cleaner.referenceTracking", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  import scala.jdk.CollectionConverters._

  def df(schemaDdl: String, rows: Row*): DataFrame =
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))

  def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    (a.isNaN && b.isNaN) || math.abs(a - b) <= tol * math.max(1.0, math.abs(b))

  def assertApprox(a: Double, b: Double, tol: Double = 1e-9): Unit =
    assert(approx(a, b, tol), s"$a != $b (tol $tol)")
}
