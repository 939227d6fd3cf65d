package graft.tables

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-STYLE table operations over versioned parquet (north star,
  * SURVEY §7.4.9): MERGE-INTO upsert, snapshot versioning with time
  * travel, dynamic partition overwrite, and small-file compaction.
  *
  * The Iceberg format/catalog jars are not available in this environment
  * (offline build); these operators reproduce the OPERATION semantics in a
  * Spark-native way with a directory-per-snapshot layout and an atomically
  * swapped `_latest` pointer file:
  *
  * ```
  * table_root/
  *   v00001/ ... parquet (optionally partitioned dirs)
  *   v00002/ ...
  *   _latest            # contains "v00002"
  * ```
  *
  * Every write creates a NEW snapshot directory and then swaps the pointer
  * (write-temp + atomic move), so readers never observe a partial table —
  * the same reader/writer isolation Iceberg's metadata pointer provides.
  * On a real deployment the same call sites map 1:1 onto
  * `MERGE INTO`/`INSERT OVERWRITE`/`CALL rewrite_data_files` and
  * `VERSION AS OF`.
  */
object TableOps extends TableBackend {

  private def latestPath(root: String) = Paths.get(root, "_latest")

  /** Current snapshot version, or None for an empty table. */
  override def currentVersion(root: String): Option[Int] = {
    val p = latestPath(root)
    if (Files.exists(p)) Some(Files.readString(p).trim.stripPrefix("v").toInt)
    else None
  }

  /** All snapshot versions, ascending. */
  override def versions(root: String): Seq[Int] = {
    val d = Paths.get(root)
    if (!Files.isDirectory(d)) return Nil
    val it = Files.list(d).iterator()
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (it.hasNext) {
      val name = it.next().getFileName.toString
      if (name.matches("v\\d+")) out += name.stripPrefix("v").toInt
    }
    out.sorted.toSeq
  }

  private def dirFor(root: String, v: Int) = f"$root/v$v%05d"

  /** Write a new snapshot and atomically swap the pointer. */
  private def commit(df: DataFrame, root: String,
                     partitionBy: Seq[String]): Int = {
    val v = currentVersion(root).getOrElse(0) + 1
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dirFor(root, v))
    val tmp = Paths.get(root, s"_latest.tmp$v")
    Files.writeString(tmp, f"v$v%05d")
    Files.move(tmp, latestPath(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    v
  }

  /** Read the current snapshot (or a specific version: time travel). */
  override def read(spark: SparkSession, root: String,
                    asOfVersion: Option[Int]): DataFrame = {
    val v = asOfVersion.orElse(currentVersion(root)).getOrElse(
      throw new IllegalStateException(s"no snapshot in $root"))
    spark.read.parquet(dirFor(root, v))
  }

  /** Create/replace the table with `df`. */
  override def overwrite(df: DataFrame, root: String,
                         partitionBy: Seq[String]): Int = {
    Files.createDirectories(Paths.get(root))
    commit(df, root, partitionBy)
  }

  /** MERGE INTO semantics: upsert `updates` into the table on `keys` —
    * matched rows are replaced by the update row, unmatched update rows
    * are inserted, unmatched target rows are kept. One outer join, one
    * snapshot write; schemas must align (unionByName semantics for new
    * nullable columns on either side). */
  override def merge(spark: SparkSession, root: String, updates: DataFrame,
                     keys: Seq[String], partitionBy: Seq[String]): Int = {
    val target = read(spark, root)
    val cols = (target.columns ++
      updates.columns.filterNot(target.columns.contains)).toSeq
    def aligned(df: DataFrame): DataFrame =
      cols.foldLeft(df)((d, c) =>
        if (d.columns.contains(c)) d
        else d.withColumn(c, lit(null)))
        .select(cols.map(col): _*)
    val t = aligned(target).alias("t")
    val u = aligned(updates).alias("u")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"u.$k")).reduce(_ && _)
    val keep = t.join(u, cond, "left_anti")
    val merged = keep.unionByName(aligned(updates))
    commit(merged, root, partitionBy)
  }

  /** DELETE WHERE semantics: new snapshot without matching rows. */
  override def deleteWhere(spark: SparkSession, root: String,
                           predicate: org.apache.spark.sql.Column,
                           partitionBy: Seq[String]): Int =
    commit(read(spark, root).filter(!predicate || predicate.isNull),
      root, partitionBy)

  private val Scd2Meta = Seq("valid_from", "valid_to", "is_current")

  /** Create/replace a table as an SCD Type-2 dimension: every row of
    * `df` becomes current as of `asOfNs` (valid_from = asOfNs,
    * valid_to = NULL, is_current = true). */
  override def scd2Overwrite(df: DataFrame, root: String, asOfNs: Long,
                             partitionBy: Seq[String]): Int =
    commit(df
      .withColumn("valid_from", lit(asOfNs))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true)), root, partitionBy)

  /** SCD Type-2 MERGE — the dimension-history upsert every warehouse
    * runs: an update whose attributes DIFFER from the key's current row
    * closes that row (valid_to = asOfNs, is_current = false) and opens
    * a new current row; an identical update is a no-op; a new key
    * inserts as current; closed history is never touched. Attribute
    * comparison is null-safe per column (a NULL attribute equals NULL).
    * `updates` must carry exactly one row per key (the caller's batch
    * dedup — enforced cheaply by requiring no duplicate keys would cost
    * a shuffle here, so it is a documented contract, as with MERGE).
    *
    * Three key-joins of the CURRENT slice vs the update batch (history
    * rows never enter a join), one snapshot write. */
  override def scd2Merge(spark: SparkSession, root: String,
                         updates: DataFrame, keys: Seq[String],
                         asOfNs: Long, partitionBy: Seq[String]): Int = {
    val target = read(spark, root)
    require(Scd2Meta.forall(target.columns.contains),
      s"not an SCD2 table (missing ${Scd2Meta.mkString("/")}): " +
        s"${target.columns.mkString(", ")}")
    val attrs = target.columns.toSeq
      .filterNot(c => keys.contains(c) || Scd2Meta.contains(c))
    val u = updates.select((keys ++ attrs).map(col): _*)
    val cur = target.filter(col("is_current"))
    val hist = target.filter(!col("is_current"))
    val t = cur.alias("t")
    val uu = u.withColumn("__m", lit(true)).alias("u")
    val keyCond = keys.map(k => col(s"t.$k") <=> col(s"u.$k"))
      .reduce(_ && _)
    val sameAttrs = attrs.map(a => col(s"t.$a") <=> col(s"u.$a"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val j = t.join(uu, keyCond, "left")
    val changed = col("__m").isNotNull && !sameAttrs
    val keep = j.filter(!changed).select(col("t.*"))
    val closedRows = j.filter(changed).select(col("t.*"))
      .withColumn("valid_to", lit(asOfNs))
      .withColumn("is_current", lit(false))
    val reopened = j.filter(changed)
      .select((keys ++ attrs).map(a => col(s"u.$a").as(a)): _*)
    val inserts = u.alias("u2").join(cur.alias("t2"),
      keys.map(k => col(s"u2.$k") <=> col(s"t2.$k")).reduce(_ && _),
      "left_anti")
    val opened = reopened.unionByName(inserts)
      .withColumn("valid_from", lit(asOfNs))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
    commit(hist.unionByName(keep).unionByName(closedRows)
      .unionByName(opened.select(target.columns.map(col): _*)),
      root, partitionBy)
  }

  /** Dynamic partition overwrite: replace only the partitions present in
    * `replacement`, keep all others (INSERT OVERWRITE ... PARTITION). */
  override def overwritePartitions(spark: SparkSession, root: String,
                                   replacement: DataFrame,
                                   partitionBy: Seq[String]): Int = {
    val target = read(spark, root)
    val parts = replacement.select(partitionBy.map(col): _*).distinct()
    val keep = target.join(broadcast(parts), partitionBy, "left_anti")
    commit(keep.unionByName(replacement.select(target.columns.map(col): _*)),
      root, partitionBy)
  }

  /** Compaction (rewrite_data_files analog): rewrite the current snapshot
    * with a target file count per partition. */
  override def compact(spark: SparkSession, root: String,
                       targetFiles: Int, partitionBy: Seq[String]): Int =
    commit(read(spark, root).repartition(targetFiles), root, partitionBy)

  /** Z-order clustering (rewrite_data_files sort-strategy analog):
    * rewrite the current snapshot ordered by the Morton interleave of the
    * cluster columns' bucket codes, range-partitioned into `targetFiles`
    * files — each file then covers a narrow range of EVERY cluster column
    * at once, so parquet min/max stats prune multi-dimensional predicates
    * (data skipping), not just the leading sort column.
    *
    * Buckets are linear `width_bucket` codes between each column's
    * min/max (one aggregate pass, driver holds 2 doubles per column);
    * the interleave is plain shift/mask arithmetic in codegen. Nulls
    * bucket to 0 and cluster together at the low end. */
  override def clusterBy(spark: SparkSession, root: String,
                         cols: Seq[String], bits: Int, targetFiles: Int,
                         partitionBy: Seq[String]): Int = {
    require(cols.nonEmpty, "clusterBy needs at least one column")
    require(bits >= 1 && bits * cols.size <= 60,
      s"bits ($bits) * columns (${cols.size}) must stay within a long")
    val t = read(spark, root)
    val aggCols = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__lo_$c"),
        max(col(c).cast("double")).as(s"__hi_$c")))
    val stats = t.agg(aggCols.head, aggCols.tail: _*).first()
    val n = 1 << bits
    val bucketCols = cols.map { c =>
      val lo = stats.getAs[Double](s"__lo_$c")
      val hi = stats.getAs[Double](s"__hi_$c")
      // width_bucket gives 1..n inside [lo,hi] and 0/n+1 outside; clamp
      // to [0, n-1] and send nulls to 0
      coalesce(
        least(greatest(
          width_bucket(col(c).cast("double"), lit(lo), lit(hi), lit(n))
            - lit(1), lit(0)), lit(n - 1)).cast("long"),
        lit(0L))
    }
    val k = cols.size
    val morton = (for {
      (b, j) <- bucketCols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * k + j))
      .reduce[org.apache.spark.sql.Column]((a, b) => a.bitwiseOR(b))
    val keyed = t.withColumn("__z", morton)
    commit(keyed.repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions("__z").drop("__z"), root, partitionBy)
  }

  /** Number of parquet data files in a snapshot (recursive, so
    * partitioned layouts count their leaf files) — the observable
    * compaction/clustering effect alongside content invariance. */
  override def dataFileCount(root: String, version: Int): Int = {
    val d = Paths.get(dirFor(root, version))
    if (!Files.isDirectory(d)) return 0
    val s = Files.walk(d)
    try s.filter(p => p.getFileName.toString.endsWith(".parquet"))
      .count().toInt
    finally s.close()
  }

  /** Expire old snapshots, keeping the most recent `keep`. */
  override def expireSnapshots(root: String, keep: Int): Seq[Int] = {
    val vs = versions(root)
    val cur = currentVersion(root).getOrElse(return Nil)
    val expire = vs.filter(_ != cur).dropRight(math.max(keep - 1, 0))
    expire.foreach { v =>
      val dir = Paths.get(dirFor(root, v))
      if (Files.isDirectory(dir)) {
        Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
    }
    expire
  }
}
