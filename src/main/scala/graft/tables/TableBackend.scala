package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The table-operation surface the six `q_table_*` gates and the SCD2
  * gate verify, extracted as a backend seam (r19 verdict stretch item:
  * the Iceberg-runtime adapter map in COVERAGE.md was prose; this trait
  * makes the claimed seam compile-checked).
  *
  * Two intended implementations:
  *
  *  - [[TableOps]] — the versioned-parquet emulation that runs in this
  *    zero-egress image (directory-per-snapshot + atomically swapped
  *    `_latest` pointer). `table` is a filesystem root path and
  *    versions are the emulation's dense 1-based ints.
  *  - an Iceberg-runtime adapter (the day `iceberg-spark-runtime` is on
  *    the classpath): `table` becomes a catalog identifier
  *    (`graft.db.<name>`) and each method maps 1:1 onto the SQL/action
  *    in COVERAGE.md's adapter table — MERGE INTO, DELETE FROM,
  *    VERSION AS OF, `writeTo(...).overwritePartitions()`,
  *    `rewrite_data_files` (plain and sort-strategy/z-order),
  *    `expire_snapshots`, and the `snapshots`/`files` metadata tables.
  *
  * Contract notes shared by both backends (what the gates' oracles
  * actually pin): every mutation produces a NEW snapshot and returns
  * its version; readers never observe a partial table; `merge` is
  * one-row-per-key upsert (matched replace / unmatched insert / target
  * keep); `scd2Merge` closes changed current rows at `asOfNs`, opens
  * replacements, inserts new keys, and never touches closed history;
  * `overwritePartitions` replaces exactly the partitions present in
  * the replacement frame; `compact`/`clusterBy` rewrite content
  * bit-identically (the gates compare content hashes and only file
  * counts/stat-pruning change). Iceberg snapshot ids are longs, not
  * dense ints — an adapter keeps a per-table ordinal→snapshot-id map
  * (the `history` metadata table is exactly that ordinal order), which
  * is why the seam deliberately types versions as the ORDINAL.
  */
trait TableBackend {

  /** Current snapshot ordinal, or None for an empty table. */
  def currentVersion(table: String): Option[Int]

  /** All snapshot ordinals, ascending. */
  def versions(table: String): Seq[Int]

  /** Read the current snapshot (or a specific ordinal: time travel). */
  def read(spark: SparkSession, table: String,
           asOfVersion: Option[Int] = None): DataFrame

  /** Create/replace the table with `df`; returns the new version. */
  def overwrite(df: DataFrame, table: String,
                partitionBy: Seq[String] = Nil): Int

  /** MERGE INTO semantics (upsert on `keys`); returns the new version. */
  def merge(spark: SparkSession, table: String, updates: DataFrame,
            keys: Seq[String], partitionBy: Seq[String] = Nil): Int

  /** DELETE WHERE semantics; returns the new version. */
  def deleteWhere(spark: SparkSession, table: String, predicate: Column,
                  partitionBy: Seq[String] = Nil): Int

  /** Create/replace as an SCD Type-2 dimension, current as of `asOfNs`. */
  def scd2Overwrite(df: DataFrame, table: String, asOfNs: Long,
                    partitionBy: Seq[String] = Nil): Int

  /** SCD Type-2 MERGE (close-changed / open-new / insert-new-keys). */
  def scd2Merge(spark: SparkSession, table: String, updates: DataFrame,
                keys: Seq[String], asOfNs: Long,
                partitionBy: Seq[String] = Nil): Int

  /** Dynamic partition overwrite: replace only partitions present in
    * `replacement`. */
  def overwritePartitions(spark: SparkSession, table: String,
                          replacement: DataFrame,
                          partitionBy: Seq[String]): Int

  /** rewrite_data_files analog: content-identical rewrite targeting
    * `targetFiles` files. */
  def compact(spark: SparkSession, table: String, targetFiles: Int,
              partitionBy: Seq[String] = Nil): Int

  /** Sort-strategy rewrite (z-order): content-identical rewrite
    * clustered on `cols` for multi-dimensional data skipping. */
  def clusterBy(spark: SparkSession, table: String, cols: Seq[String],
                bits: Int = 8, targetFiles: Int = 8,
                partitionBy: Seq[String] = Nil): Int

  /** Data files in a snapshot (the observable compaction effect). */
  def dataFileCount(table: String, version: Int): Int

  /** Expire old snapshots, keeping the most recent `keep`; returns the
    * expired ordinals. */
  def expireSnapshots(table: String, keep: Int = 2): Seq[Int]
}
