package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Content-defined document chunking: split long documents at boundaries
  * decided by the CONTENT (a hash test on each token), not at fixed
  * offsets — the property RAG and pretrain splitters want, because an
  * edit then reflows only the chunks up to the next surviving boundary
  * instead of shifting every downstream chunk (the fixed-size splitter
  * failure mode; ChunkingSpec pins this locality).
  *
  * Boundary rule: cut AFTER any token whose md5 hex digest starts with a
  * boundary nibble (P = 1/16 per token -> expected chunk length 16
  * tokens per boundary nibble; pass 2 nibbles for ~8). md5 keeps the
  * rule portable across engines, so the whole operator is
  * oracle-checkable — unlike gear/Rabin tables that live only in one
  * implementation.
  *
  * Scale shape: one explode (row-local) + one window shuffle on the doc
  * id, whose partitions are single documents (bounded by doc length,
  * never corpus size), then one (doc, chunk) aggregation with ordered
  * reassembly via sorted structs (collect_list alone has no order
  * contract).
  */
object Chunking {

  /** One row per (doc, chunk): 0-based `chunk_idx`, token count, the
    * chunk text, and its md5 (the cheap identity for downstream dedup /
    * diffing). Tokens are `\s+` splits of the trimmed text, case
    * preserved — chunking must not alter content. */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                boundaryNibbles: String = "0"): DataFrame = {
    require(boundaryNibbles.nonEmpty &&
      boundaryNibbles.forall("0123456789abcdef".contains(_)),
      s"boundaryNibbles must be lowercase hex chars, got '$boundaryNibbles'")
    val toks = docs
      .select(col(idCol), posexplode(TextFunctions.tokens(col(textCol))))
      .withColumnRenamed("pos", "__pos")
      .withColumnRenamed("col", "__tok")
    // cut AFTER a boundary token: a token's chunk is the count of
    // boundaries strictly BEFORE it
    val isBoundary = when(
      substring(md5(col("__tok")), 1, 1)
        .isin(boundaryNibbles.map(_.toString): _*), 1L).otherwise(0L)
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("chunk_idx", coalesce(sum(isBoundary).over(w), lit(0L)))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(count(lit(1)).as("n_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__tok")))),
            s => s.getField("__tok")), " ").as("chunk_text"))
      .withColumn("chunk_md5", md5(col("chunk_text")))
  }
}
