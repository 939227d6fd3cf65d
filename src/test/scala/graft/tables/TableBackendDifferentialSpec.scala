package graft.tables

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}
import graft.SparkSpec

/** A second, INDEPENDENT implementation of [[TableBackend]]: snapshots
  * are driver-side row vectors and the upsert/SCD2/partition-overwrite
  * semantics are written in plain Scala collections — no joins, no
  * parquet, no version directories. It exists only to exercise the
  * backend seam the way an Iceberg adapter would (COVERAGE.md adapter
  * map): if the two implementations ever disagree on an operation
  * script, either the trait's contract is underspecified or one
  * implementation drifted. Scalar predicate evaluation (deleteWhere)
  * deliberately delegates to the engine — the seam's contract is the
  * TABLE semantics (snapshot-per-mutation, ordinal time travel, null
  * -safe upsert matching, close/open SCD2 rows, partition replacement),
  * not expression evaluation. File-count faces (dataFileCount,
  * compact/clusterBy's physical effect) are out of the double's scope:
  * their cross-backend observable is CONTENT invariance, which the
  * script checks through read().
  */
private[tables] final class InMemoryTableBackend(spark: SparkSession)
    extends TableBackend {

  private case class Snap(version: Int, schema: StructType,
                          rows: Vector[Row])
  private val tables =
    scala.collection.mutable.Map.empty[String, Vector[Snap]]

  private def live(table: String): Vector[Snap] =
    tables.getOrElse(table, Vector.empty)
  private def current(table: String): Snap =
    live(table).lastOption.getOrElse(
      throw new IllegalStateException(s"no snapshot in $table"))
  private def commit(table: String, schema: StructType,
                     rows: Vector[Row]): Int = {
    val v = live(table).lastOption.map(_.version).getOrElse(0) + 1
    tables(table) = live(table) :+ Snap(v, schema, rows)
    v
  }
  private def toDf(s: Snap): DataFrame =
    spark.createDataFrame(s.rows.asJava, s.schema)

  override def currentVersion(table: String): Option[Int] =
    live(table).lastOption.map(_.version)
  override def versions(table: String): Seq[Int] =
    live(table).map(_.version)
  override def read(spark: SparkSession, table: String,
                    asOfVersion: Option[Int]): DataFrame = {
    val snaps = live(table)
    val s = asOfVersion.fold(snaps.lastOption)(v =>
      snaps.find(_.version == v)).getOrElse(
      throw new IllegalStateException(s"no snapshot in $table"))
    toDf(s)
  }
  override def overwrite(df: DataFrame, table: String,
                         partitionBy: Seq[String]): Int =
    commit(table, df.schema, df.collect().toVector)

  /** Null-safe key tuple: Row values compare with null == null true
    * under plain Scala equality, which is exactly `<=>`. */
  private def keyOf(r: Row, schema: StructType, keys: Seq[String]) =
    keys.map(k => r.get(schema.fieldIndex(k)))

  override def merge(spark: SparkSession, table: String,
                     updates: DataFrame, keys: Seq[String],
                     partitionBy: Seq[String]): Int = {
    val t = current(table)
    val newFields = updates.schema.fields
      .filterNot(f => t.schema.fieldNames.contains(f.name))
    val evolved = StructType(t.schema.fields.map(_.copy(nullable = true))
      ++ newFields.map(_.copy(nullable = true)))
    def align(r: Row, s: StructType): Row = Row.fromSeq(
      evolved.fieldNames.toSeq.map(c =>
        if (s.fieldNames.contains(c)) r.get(s.fieldIndex(c)) else null))
    val up = updates.collect().toVector
    val upKeys = up.map(r => keyOf(r, updates.schema, keys)).toSet
    val kept = t.rows.filterNot(r => upKeys(keyOf(r, t.schema, keys)))
      .map(align(_, t.schema))
    commit(table, evolved, kept ++ up.map(align(_, updates.schema)))
  }

  override def deleteWhere(spark: SparkSession, table: String,
                           predicate: Column,
                           partitionBy: Seq[String]): Int = {
    val t = current(table)
    val remaining = toDf(t).filter(!predicate || predicate.isNull)
      .collect().toVector
    commit(table, t.schema, remaining)
  }

  private val meta = Seq("valid_from", "valid_to", "is_current")

  override def scd2Overwrite(df: DataFrame, table: String, asOfNs: Long,
                             partitionBy: Seq[String]): Int = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("valid_from", LongType, nullable = false),
      StructField("valid_to", LongType, nullable = true),
      StructField("is_current", BooleanType, nullable = false)))
    commit(table, schema, df.collect().toVector
      .map(r => Row.fromSeq(r.toSeq ++ Seq(asOfNs, null, true))))
  }

  override def scd2Merge(spark: SparkSession, table: String,
                         updates: DataFrame, keys: Seq[String],
                         asOfNs: Long, partitionBy: Seq[String]): Int = {
    val t = current(table)
    val cols = t.schema.fieldNames.toSeq
    val attrs = cols.filterNot(c => keys.contains(c) || meta.contains(c))
    def field(r: Row, c: String) = r.get(t.schema.fieldIndex(c))
    val (cur, hist) = t.rows.partition(r =>
      r.getBoolean(t.schema.fieldIndex("is_current")))
    val up = updates.collect().toVector
    val upByKey = up.map(r =>
      keyOf(r, updates.schema, keys) -> r).toMap
    def uField(r: Row, c: String) = r.get(updates.schema.fieldIndex(c))
    var out = hist
    val curKeys = cur.map(r => keyOf(r, t.schema, keys)).toSet
    cur.foreach { r =>
      upByKey.get(keyOf(r, t.schema, keys)) match {
        case Some(u) if attrs.exists(a => field(r, a) != uField(u, a)) =>
          // close the changed current row, open the update as current
          out :+= Row.fromSeq(cols.map {
            case "valid_to" => asOfNs
            case "is_current" => false
            case c => field(r, c)
          })
          out :+= Row.fromSeq(cols.map {
            case "valid_from" => asOfNs
            case "valid_to" => null
            case "is_current" => true
            case c => uField(u, c)
          })
        case _ => out :+= r // unmatched or identical update: no-op
      }
    }
    up.filterNot(u => curKeys(keyOf(u, updates.schema, keys)))
      .foreach { u =>
        out :+= Row.fromSeq(cols.map {
          case "valid_from" => asOfNs
          case "valid_to" => null
          case "is_current" => true
          case c => uField(u, c)
        })
      }
    commit(table, t.schema, out)
  }

  override def overwritePartitions(spark: SparkSession, table: String,
                                   replacement: DataFrame,
                                   partitionBy: Seq[String]): Int = {
    val t = current(table)
    val repl = replacement.collect().toVector
    val replParts = repl.map(r =>
      keyOf(r, replacement.schema, partitionBy)).toSet
    val kept = t.rows.filterNot(r =>
      replParts(keyOf(r, t.schema, partitionBy)))
    val aligned = repl.map(r => Row.fromSeq(t.schema.fieldNames.toSeq
      .map(c => r.get(replacement.schema.fieldIndex(c)))))
    commit(table, t.schema, kept ++ aligned)
  }

  override def compact(spark: SparkSession, table: String,
                       targetFiles: Int, partitionBy: Seq[String]): Int = {
    val t = current(table)
    commit(table, t.schema, t.rows) // content-identical by contract
  }
  override def clusterBy(spark: SparkSession, table: String,
                         cols: Seq[String], bits: Int, targetFiles: Int,
                         partitionBy: Seq[String]): Int = {
    val t = current(table)
    commit(table, t.schema, t.rows) // content-identical by contract
  }
  override def dataFileCount(table: String, version: Int): Int = 0

  override def expireSnapshots(table: String, keep: Int): Seq[Int] = {
    val snaps = live(table)
    if (snaps.isEmpty) return Nil
    val cur = snaps.last.version
    val others = snaps.map(_.version).filter(_ != cur)
    val expire = others.dropRight(math.max(keep - 1, 0))
    tables(table) = snaps.filterNot(s => expire.contains(s.version))
    expire
  }
}

class TableBackendDifferentialSpec extends SparkSpec {

  private def tmp() = java.nio.file.Files
    .createTempDirectory("tbl_diff").resolve("t").toString

  /** Canonical frame image: column-name-sorted, row-sorted value
    * matrix — the same shape the driver's oracle hash uses. */
  private def image(d: DataFrame): (Seq[String], Seq[Seq[String]]) = {
    val cols = d.columns.sorted.toSeq
    val rows = d.select(cols.map(col): _*).collect().toSeq
      .map(_.toSeq.map(String.valueOf))
      .sortBy(_.mkString(""))
    (cols, rows)
  }

  private def assertSame(a: DataFrame, b: DataFrame, where: String): Unit = {
    val (ca, ra) = image(a)
    val (cb, rb) = image(b)
    assert(ca == cb, s"$where: columns $ca vs $cb")
    assert(ra == rb, s"$where: rows differ\n parquet: $ra\n memory:  $rb")
  }

  private def base() = df("id BIGINT, ticker STRING, v DOUBLE",
    Row(1L, "A", 1.0), Row(2L, "A", 2.0), Row(3L, "B", 3.0))

  test("the versioned-parquet backend and an independent in-memory " +
    "backend agree on a full operation script through the TableBackend " +
    "seam (overwrite, evolving merge, null-safe delete, partition " +
    "overwrite, time travel, expiry)") {
    val mem = new InMemoryTableBackend(spark)
    val backends: Seq[(TableBackend, String)] =
      Seq((TableOps, tmp()), (mem, "t"))

    def onBoth(step: String)(op: (TableBackend, String) => Int): Unit = {
      val vs = backends.map { case (b, t) => op(b, t) }
      assert(vs.distinct.size == 1, s"$step: versions $vs")
      val Seq((b1, t1), (b2, t2)) = backends
      assertSame(b1.read(spark, t1), b2.read(spark, t2), step)
    }

    onBoth("overwrite")((b, t) => b.overwrite(base(), t))
    // schema evolution + an all-null-attribute row for the null-safe path
    val updates = df("id BIGINT, ticker STRING, v DOUBLE, score DOUBLE",
      Row(2L, "A", 20.0, 0.9), Row(4L, "C", 4.0, 0.7),
      Row(5L, "D", null, 0.5))
    onBoth("merge")((b, t) => b.merge(spark, t, updates, Seq("id")))
    // v > 10 deletes only id=2; id=5's NULL v must survive (predicate
    // null means keep — both backends route through the same rule)
    onBoth("deleteWhere")((b, t) =>
      b.deleteWhere(spark, t, col("v") > 10))
    // replace ticker-A partition only
    val repl = df("id BIGINT, ticker STRING, v DOUBLE, score DOUBLE",
      Row(10L, "A", 100.0, 0.1))
    onBoth("overwritePartitions")((b, t) =>
      b.overwritePartitions(spark, t, repl, Seq("ticker")))

    val Seq((b1, t1), (b2, t2)) = backends
    assert(b1.versions(t1) == b2.versions(t2))
    assert(b1.currentVersion(t1) == b2.currentVersion(t2))
    // time travel must agree at EVERY ordinal, not just the head
    b1.versions(t1).foreach { v =>
      assertSame(b1.read(spark, t1, Some(v)),
        b2.read(spark, t2, Some(v)), s"time travel v$v")
    }
    // expiry: same ordinals expired, head still readable and equal
    val e1 = b1.expireSnapshots(t1, keep = 2)
    val e2 = b2.expireSnapshots(t2, keep = 2)
    assert(e1 == e2, s"expired $e1 vs $e2")
    assertSame(b1.read(spark, t1), b2.read(spark, t2), "post-expiry")
  }

  test("the two backends agree on SCD2 overwrite + merge (close the " +
    "changed row, no-op the identical row, insert the new key)") {
    val mem = new InMemoryTableBackend(spark)
    val backends: Seq[(TableBackend, String)] =
      Seq((TableOps, tmp()), (mem, "scd"))
    backends.foreach { case (b, t) =>
      b.scd2Overwrite(base(), t, asOfNs = 1000L)
    }
    val upd = df("id BIGINT, ticker STRING, v DOUBLE",
      Row(1L, "A", 1.0),    // identical -> no-op
      Row(2L, "A", 22.0),   // changed  -> close + reopen
      Row(7L, "Z", 7.0))    // new key  -> insert current
    backends.foreach { case (b, t) =>
      b.scd2Merge(spark, t, upd, Seq("id"), asOfNs = 2000L)
    }
    val Seq((b1, t1), (b2, t2)) = backends
    assertSame(b1.read(spark, t1), b2.read(spark, t2), "scd2")
    // and the semantics themselves, once, against the parquet backend
    val out = b1.read(spark, t1)
    assert(out.filter(col("is_current")).count() == 4)
    assert(out.filter(!col("is_current")).count() == 1)
    assert(out.filter(col("id") === 2 && !col("is_current"))
      .select("valid_to").head().getLong(0) == 2000L)
  }

  test("the two backends agree on NULL-SAFE matching: a null merge key " +
    "matches a null key (<=>), and a null attribute equal to a null " +
    "attribute is an SCD2 no-op — the semantics an adapter that joins " +
    "with plain equality would silently get wrong") {
    val mem = new InMemoryTableBackend(spark)
    val backends: Seq[(TableBackend, String)] =
      Seq((TableOps, tmp()), (mem, "nulls"))
    // a null-keyed row in the target must be REPLACED by a null-keyed
    // update under <=>, not duplicated (plain = would never match it)
    val target = df("k STRING, v DOUBLE",
      Row("a", 1.0), Row(null, 2.0))
    val upd = df("k STRING, v DOUBLE",
      Row(null, 20.0), Row("b", 3.0))
    backends.foreach { case (b, t) => b.overwrite(target, t) }
    backends.foreach { case (b, t) => b.merge(spark, t, upd, Seq("k")) }
    val Seq((b1, t1), (b2, t2)) = backends
    assertSame(b1.read(spark, t1), b2.read(spark, t2), "null-key merge")
    val m = b1.read(spark, t1)
    assert(m.count() == 3, "null key must match null key, not insert")
    assert(m.filter(col("k").isNull).head().getDouble(1) == 20.0)

    // SCD2: a null attribute updated to null is IDENTICAL (no-op, no
    // history row); null -> value and value -> null both close+reopen
    val dim = df("id BIGINT, attr STRING",
      Row(1L, null), Row(2L, "x"), Row(3L, null))
    backends.foreach { case (b, t) =>
      b.scd2Overwrite(dim, s"${t}_scd", asOfNs = 10L)
    }
    val dimUpd = df("id BIGINT, attr STRING",
      Row(1L, null),   // null == null -> no-op
      Row(2L, null),   // value -> null: close + reopen
      Row(3L, "y"))    // null -> value: close + reopen
    backends.foreach { case (b, t) =>
      b.scd2Merge(spark, s"${t}_scd", dimUpd, Seq("id"), asOfNs = 20L)
    }
    assertSame(b1.read(spark, s"${t1}_scd"), b2.read(spark, s"${t2}_scd"),
      "null-attr scd2")
    val s = b1.read(spark, s"${t1}_scd")
    assert(s.filter(!col("is_current")).count() == 2,
      "exactly ids 2 and 3 close; id 1's null==null must be a no-op")
    assert(s.filter(col("id") === 1).count() == 1)
  }
}
