package graft.tables

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TableOpsSpec extends SparkSpec {

  private def tmp() = java.nio.file.Files
    .createTempDirectory("tbl").resolve("t").toString

  private def base() = df("id BIGINT, ticker STRING, v DOUBLE",
    Row(1L, "A", 1.0), Row(2L, "A", 2.0), Row(3L, "B", 3.0))

  test("overwrite + read + version bookkeeping") {
    val root = tmp()
    val v1 = TableOps.overwrite(base(), root)
    assert(v1 == 1 && TableOps.currentVersion(root).contains(1))
    assert(TableOps.read(spark, root).count() == 3)
  }

  test("merge: upsert on key — update matched, insert new, keep rest") {
    val root = tmp()
    TableOps.overwrite(base(), root)
    val updates = df("id BIGINT, ticker STRING, v DOUBLE",
      Row(2L, "A", 20.0), Row(4L, "C", 4.0))
    val v2 = TableOps.merge(spark, root, updates, Seq("id"))
    assert(v2 == 2)
    val out = TableOps.read(spark, root).orderBy(col("id")).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out == Map(1L -> 1.0, 2L -> 20.0, 3L -> 3.0, 4L -> 4.0))
  }

  test("merge with schema evolution: a new update column joins the " +
    "schema, pre-existing rows read null, round-trips through parquet") {
    val root = tmp()
    TableOps.overwrite(base(), root)
    val updates = df("id BIGINT, ticker STRING, v DOUBLE, score DOUBLE",
      Row(2L, "A", 20.0, 0.9), Row(4L, "C", 4.0, 0.7))
    TableOps.merge(spark, root, updates, Seq("id"))
    val out = TableOps.read(spark, root)
    assert(out.columns.contains("score"))
    assert(out.schema("score").dataType ==
      org.apache.spark.sql.types.DoubleType,
      s"evolved column must keep the update side's type, got " +
        s"${out.schema("score").dataType}")
    val scores = out.orderBy(col("id")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("score"))) None
         else Some(r.getDouble(r.fieldIndex("score"))))).toMap
    assert(scores == Map(1L -> None, 2L -> Some(0.9), 3L -> None,
      4L -> Some(0.7)))
  }

  test("time travel reads an old snapshot") {
    val root = tmp()
    TableOps.overwrite(base(), root)
    TableOps.merge(spark, root,
      df("id BIGINT, ticker STRING, v DOUBLE", Row(1L, "A", 99.0)),
      Seq("id"))
    val v1 = TableOps.read(spark, root, asOfVersion = Some(1))
      .filter(col("id") === 1).collect()(0).getDouble(2)
    val v2 = TableOps.read(spark, root)
      .filter(col("id") === 1).collect()(0).getDouble(2)
    assert(v1 == 1.0 && v2 == 99.0)
  }

  test("deleteWhere removes matching rows only") {
    val root = tmp()
    TableOps.overwrite(base(), root)
    TableOps.deleteWhere(spark, root, col("ticker") === "A")
    val ids = TableOps.read(spark, root).collect().map(_.getLong(0))
    assert(ids.sameElements(Array(3L)))
  }

  test("overwritePartitions replaces named partitions, keeps others") {
    val root = tmp()
    TableOps.overwrite(base(), root, partitionBy = Seq("ticker"))
    val repl = df("id BIGINT, ticker STRING, v DOUBLE",
      Row(9L, "A", 9.0))
    TableOps.overwritePartitions(spark, root, repl, Seq("ticker"))
    val out = TableOps.read(spark, root).orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getAs[String]("ticker")))
    assert(out.sameElements(Array(3L -> "B", 9L -> "A")))
  }

  test("expireSnapshots keeps current + most recent") {
    val root = tmp()
    TableOps.overwrite(base(), root)
    TableOps.overwrite(base(), root)
    TableOps.overwrite(base(), root)
    val expired = TableOps.expireSnapshots(root, keep = 2)
    assert(expired == Seq(1))
    assert(TableOps.versions(root) == Seq(2, 3))
    // current still readable
    assert(TableOps.read(spark, root).count() == 3)
  }

  test("compact: file count drops to target, content and version " +
    "history unchanged") {
    val root = tmp()
    val wide = spark.range(1000)
      .select(col("id"), (col("id") * 3L).as("v"))
    TableOps.overwrite(wide.repartition(8), root)
    assert(TableOps.dataFileCount(root, 1) == 8)
    val before = TableOps.read(spark, root).collect().toSet
    TableOps.compact(spark, root, targetFiles = 2)
    assert(TableOps.dataFileCount(root, 2) == 2)
    assert(TableOps.read(spark, root).collect().toSet == before)
    // compaction is a new snapshot: time travel to the fragmented one
    assert(TableOps.read(spark, root, Some(1)).collect().toSet == before)
  }

  test("clusterBy: every file covers a narrow range of BOTH cluster " +
    "columns (multi-dimensional data skipping), content preserved") {
    import org.apache.spark.sql.functions.input_file_name
    val root = tmp()
    // two independent uniform dimensions — the case a single-column sort
    // cannot cluster on both
    val rng = new scala.util.Random(7)
    val rows = (1 to 4000).map(i =>
      Row(i.toLong, rng.nextDouble() * 100.0, rng.nextDouble() * 100.0))
    TableOps.overwrite(df("id BIGINT, x DOUBLE, y DOUBLE", rows: _*), root)
    TableOps.clusterBy(spark, root, Seq("x", "y"), bits = 8,
      targetFiles = 16)
    val out = TableOps.read(spark, root)
    assert(out.count() == 4000)
    assert(out.agg(org.apache.spark.sql.functions.sum(col("id")))
      .head().getLong(0) == (1 to 4000).map(_.toLong).sum)
    val ranges = out.withColumn("f", input_file_name())
      .groupBy("f")
      .agg((org.apache.spark.sql.functions.max(col("x")) -
        org.apache.spark.sql.functions.min(col("x"))).as("rx"),
        (org.apache.spark.sql.functions.max(col("y")) -
          org.apache.spark.sql.functions.min(col("y"))).as("ry"))
      .collect()
    assert(ranges.length > 4, "expected multiple output files")
    val avgRx = ranges.map(_.getDouble(1)).sum / ranges.length
    val avgRy = ranges.map(_.getDouble(2)).sum / ranges.length
    // 16 z-range files over 2 uniform dims: each file's per-dim extent
    // should be well under the full 100 range on BOTH dims
    assert(avgRx < 60.0, s"x not clustered: avg per-file range $avgRx")
    assert(avgRy < 60.0, s"y not clustered: avg per-file range $avgRy")
  }

  test("readers never see a partial table (pointer swap is atomic)") {
    val root = tmp()
    TableOps.overwrite(base(), root)
    // pointer file contains a valid version name after every commit
    val ptr = java.nio.file.Files.readString(
      java.nio.file.Paths.get(root, "_latest")).trim
    assert(ptr.matches("v\\d{5}"))
  }

  test("scd2Merge: changed closes + reopens, identical is a no-op, " +
    "new key inserts, history accumulates over batches") {
    val root = tmp()
    TableOps.scd2Overwrite(base(), root, asOfNs = 0L)
    // batch 1 @ t=100: id 1 changes, id 2 identical, id 4 new
    TableOps.scd2Merge(spark, root,
      df("id BIGINT, ticker STRING, v DOUBLE",
        Row(1L, "A", 10.0), Row(2L, "A", 2.0), Row(4L, "C", 4.0)),
      Seq("id"), asOfNs = 100L)
    def snap() = TableOps.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getBoolean(5), r.getDouble(2))).toSet
    assert(snap() == Set(
      (1L, 0L, Some(100L), false, 1.0),   // closed
      (1L, 100L, None, true, 10.0),       // reopened
      (2L, 0L, None, true, 2.0),          // no-op: original row kept
      (3L, 0L, None, true, 3.0),          // untouched by the batch
      (4L, 100L, None, true, 4.0)))       // insert
    // batch 2 @ t=200: id 1 changes AGAIN — history keeps both layers
    TableOps.scd2Merge(spark, root,
      df("id BIGINT, ticker STRING, v DOUBLE", Row(1L, "A", 11.0)),
      Seq("id"), asOfNs = 200L)
    val h1 = snap().filter(_._1 == 1L)
    assert(h1 == Set(
      (1L, 0L, Some(100L), false, 1.0),
      (1L, 100L, Some(200L), false, 10.0),
      (1L, 200L, None, true, 11.0)))
    // merging the identical batch again is a full no-op on content
    val before = snap()
    TableOps.scd2Merge(spark, root,
      df("id BIGINT, ticker STRING, v DOUBLE", Row(1L, "A", 11.0)),
      Seq("id"), asOfNs = 300L)
    assert(snap() == before)
  }
}
