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

  /** Fixed-size sliding-window chunking with overlap — the RAG splitter:
    * chunk `i` covers tokens `[i*stride, i*stride + window)`, so
    * consecutive chunks share `window - stride` tokens of context.
    * Complements [[cdcChunks]]: content-defined cuts give edit
    * stability, overlapping fixed windows give retrieval recall (a
    * passage that straddles one cut is whole in the neighbouring
    * chunk).
    *
    * Chunk count is `1 + ceil(max(0, n - window) / stride)` — every
    * token is covered, every chunk contributes at least one new token,
    * and the last chunk may be short (it is NOT back-shifted: a
    * back-shifted tail would duplicate `window - (n mod stride)` tokens
    * verbatim, which downstream exact-dedup would then delete).
    *
    * Scale shape: ZERO shuffles — tokens, chunk count, and each slice
    * are all row-local (`sequence` + `explode` + `slice`), so the
    * operator rides whatever partitioning the scan already has. Output
    * rows = input tokens / stride, bounded by the corpus token count.
    */
  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
                    window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window=$window], got $stride")
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
    // last chunk index: 0 when the doc fits in one window, else
    // ceil((n - window) / stride) via integer arithmetic
    val lastIdx = when(col("__n") <= window, lit(0)).otherwise(
      floor((col("__n") - lit(window) + lit(stride) - lit(1)) /
        lit(stride.toDouble)).cast("int"))
    val start = col("chunk_idx") * lit(stride) // 0-based token offset
    toks
      .withColumn("chunk_idx", explode(sequence(lit(0), lastIdx)))
      .withColumn("n_tokens",
        least(lit(window), col("__n") - start).cast("int"))
      .withColumn("chunk_text",
        array_join(slice(col("__toks"), start + lit(1), lit(window)), " "))
      .withColumn("chunk_md5", md5(col("chunk_text")))
      .select(col(idCol), col("chunk_idx"), col("n_tokens"),
        col("chunk_text"), col("chunk_md5"))
  }
}
