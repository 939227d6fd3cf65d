package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for ANN indexes (Jegou, Douze, Schmid 2011,
  * "Product quantization for nearest neighbor search").
  *
  * The 100 TB memory story for vector search: a d-dim float embedding
  * (d*4 bytes) compresses to m subspace codes (m bytes at k <= 256) by
  * splitting the vector into m contiguous subvectors and quantizing each
  * against its own k-centroid codebook. Search uses Asymmetric Distance
  * Computation (ADC): per query, ONE m x k table of exact
  * query-to-centroid subdistances, then every corpus code scores with m
  * table lookups — no float math per candidate. [[Embeddings.quantizeInt8]]
  * is the 4x story; PQ at m=8 over 64 dims is 32x.
  *
  * Determinism discipline (same as [[Clustering]], whose per-subspace
  * k-means this reuses): codebook init = k smallest ids, micro-rounded
  * argmin encode, and the ADC table itself is micro-rounded to LONG per
  * cell — so the approximate distance is an INTEGER sum of m lookups and
  * the ranking has no float tie ambiguity at all: same corpus, same
  * codebooks, same ranking on any engine, rerun, or layout.
  *
  * Scale shape: training runs m independent k-means (each one pass per
  * iteration over a dsub-wide slice); encoding is a row-local argmin
  * against m*k broadcast centroid literals; search broadcasts the query
  * frame (with its per-query tables) onto the codes and ranks per query
  * over candidates. Compose with [[Similarity.ivfTopK]]'s cell routing
  * when the corpus is too large to score every code per query. */
object Pq {

  /** Trained codebooks: `cb(subspace)(centroid)(dim)`; `dsub` = dims
    * per subspace. Driver-resident (m * k * dsub doubles — tiny). */
  final case class Codebooks(m: Int, dsub: Int,
                             cb: Array[Array[Array[Double]]])

  /** Train per-subspace codebooks — bit-identical to running
    * [[Clustering.kmeansCentroids]] on each slice (same init = k
    * smallest ids, same micro-rounded argmin, same DECIMAL dim means,
    * same emptied-cluster rule; PqSpec and the q_pq_ann oracle pin it),
    * but JOINTLY: all m subspaces advance in ONE distributed pass per
    * iteration (subspaces explode to (j, c, subvec) rows and one
    * partial-aggregated groupBy updates every codebook), versus m
    * independent runs each paying per-iteration job overhead. The
    * vector dimension must divide evenly into `m` subspaces.
    *
    * At corpus scale, do NOT train on the full table: codebooks need a
    * representative learning set, not every row (Jegou et al. 2011 §V),
    * and each iteration here is a full pass over `df`. Compose with the
    * deterministic sampler —
    * `train(Sampling.bernoulliSample(e, id, 0.01), ...)` — and spend
    * the passes on the sample; the r17 wide-decade probe measured ~2/3
    * of the whole PQ serve pipeline's cost going to avoidable full-
    * corpus retraining (SCALE.md, x1024 section). */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int,
            k: Int, maxIter: Int): Codebooks = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(maxIter >= 0, s"maxIter must be non-negative, got $maxIter")
    val vec = transform(col(vecCol), _.cast("double"))
    val initRows = df.select(col(idCol), vec.as("__v"))
      .orderBy(col(idCol)).limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    require(initRows.length == k,
      s"k=$k but the input has only ${initRows.length} rows")
    // width from the init rows — the former separate head() probe paid
    // one extra job for a value the init collect already carries (the
    // operator requires a constant width; mismatches still fail loudly
    // in the slice/assign arithmetic below)
    val dim = initRows.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    var cbs: Array[Array[Array[Double]]] = Array.tabulate(m)(j =>
      initRows.map(r => r.slice(j * dsub, (j + 1) * dsub)))
    // fan the per-iteration scans wide: the m*k distance folds per row
    // are the expensive row-local stage, and a single-split local scan
    // otherwise runs them on one core (graft.core.Par — no-op at cluster
    // scale; decimal dim means are order-independent, so partitioning
    // cannot change a codebook bit)
    val dfF = graft.core.Par.fanOut(df, col(idCol))
    for (_ <- 1 to maxIter) {
      val subStructs = array((0 until m).map { j =>
        val sub = slice(vec, j * dsub + 1, dsub)
        struct(lit(j).as("j"), Clustering.assign(sub, cbs(j)).as("c"),
          sub.as("sub"))
      }: _*)
      val exploded = dfF.select(explode(subStructs).as("e"))
        .select(col("e.j").as("__km_j"), col("e.c").as("__km_c"),
          col("e.sub").as("__km_v"))
      val means = Embeddings.meanPoolLong(exploded,
          Seq("__km_j", "__km_c"), "__km_v")
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
        .groupBy(t => (t._1, t._2))
        .map { case (jc, dims) => jc -> dims.sortBy(_._3).map(_._4) }
      cbs = Array.tabulate(m)(j => Array.tabulate(k)(c =>
        means.getOrElse((j, c), cbs(j)(c))))
    }
    Codebooks(m, dsub, cbs)
  }

  /** Append the PQ code column: `m` int codes, each the micro-rounded
    * argmin centroid of its subvector. Row-local against broadcast
    * centroid literals. */
  def encode(df: DataFrame, vecCol: String, books: Codebooks,
             codeCol: String = "pq_code"): DataFrame = {
    val vec = transform(col(vecCol), _.cast("double"))
    // row-local argmin per subspace — fanned wide so a single-split scan
    // doesn't serialize the m*k distance folds (and the downstream ADC
    // scoring, which runs in this frame's partitions) on one core
    graft.core.Par.fanOut(df)
      .withColumn(codeCol, array((0 until books.m).map { j =>
        Clustering.assign(slice(vec, j * books.dsub + 1, books.dsub),
          books.cb(j)).cast("int")
      }: _*))
  }

  /** ADC top-k: for each query, the exact m x k subdistance table
    * (micro-rounded LONG cells), then every corpus code scores as an
    * integer sum of m lookups; rank ascending, ties to the smaller
    * corpus id. Queries (with their tables) broadcast onto the codes. */
  def searchTopK(queries: DataFrame, codes: DataFrame, qId: String,
                 cId: String, qVec: String, books: Codebooks,
                 k: Int, codeCol: String = "pq_code",
                 excludeSelf: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    rankTopK(adcScored(queries, codes, qId, cId, qVec, books, codeCol,
      excludeSelf), k, codes.schema(cId).dataType)
  }

  /** Window-ranked face of [[searchTopK]] — shuffles the full scored
    * frame; only the differential reference in PqSpec. */
  private[graft] def searchTopKWindow(queries: DataFrame,
      codes: DataFrame, qId: String, cId: String, qVec: String,
      books: Codebooks, k: Int, codeCol: String = "pq_code",
      excludeSelf: Boolean = true): DataFrame =
    rankTopKWindow(adcScored(queries, codes, qId, cId, qVec, books,
      codeCol, excludeSelf), k)

  /** Per-query m x k subdistance table — the native codegen'd kernel
    * ([[graft.plans.PqSubDistTableExpr]]); PqSpec pins bit equality
    * against [[dtabHof]]. */
  private[operators] def dtabCol(qv: Column, books: Codebooks): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val k = books.cb.head.length
    GraftColumnBridge.column(graft.plans.PqSubDistTableExpr(
      GraftColumnBridge.expression(qv),
      books.cb.flatMap(_.flatMap(_.toSeq)).toSeq, books.m, k, books.dsub))
  }

  /** Interpreted unrolled twin of [[dtabCol]], kept for differential
    * verification of the native kernel. */
  private[operators] def dtabHof(qv: Column, books: Codebooks): Column =
    array((0 until books.m).map { j =>
      array(books.cb(j).map { c =>
        Clustering.microL(Clustering.sqDist(
          slice(qv, j * books.dsub + 1, books.dsub), c))
      }: _*)
    }: _*)

  /** Per-candidate ADC distance — the native codegen'd kernel
    * ([[graft.plans.AdcDistExpr]]); PqSpec pins bit equality against
    * [[distHof]]. */
  private[operators] def distCol(dtab: Column, code: Column,
                                 m: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.plans.AdcDistExpr(
      GraftColumnBridge.expression(dtab),
      GraftColumnBridge.expression(code), m))
  }

  /** Interpreted aggregate twin of [[distCol]], kept for differential
    * verification of the native kernel. */
  private[operators] def distHof(dtab: Column, code: Column,
                                 m: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0L),
      (acc, j) => acc + element_at(element_at(dtab, j + 1),
        element_at(code, j + 1) + 1))

  /** The scored `(query_id, corpus_id, adc_dist)` frame shared by both
    * flat-PQ rank faces: per-query m x k ADC table broadcast onto every
    * corpus code, distance = integer sum of m table lookups (both the
    * table build and the per-candidate sum are native kernels — the
    * candidate loop is the hottest row-local stage of the PQ family). */
  private def adcScored(queries: DataFrame, codes: DataFrame,
      qId: String, cId: String, qVec: String, books: Codebooks,
      codeCol: String, excludeSelf: Boolean): DataFrame = {
    val qv = transform(col(qVec), _.cast("double"))
    // null vectors/codes would yield null distances, which sort FIRST
    // under asc ordering — exclude them on both sides instead
    val q = queries.filter(col(qVec).isNotNull)
      .select(col(qId).as("query_id"), dtabCol(qv, books).as("__dtab"))
    val dist = distCol(col("__dtab"), col(codeCol), books.m)
    val scored = codes.filter(col(codeCol).isNotNull)
      .select(col(cId).as("corpus_id"), col(codeCol))
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("corpus_id"), dist.as("adc_dist"))
    if (excludeSelf) scored.filter(col("query_id") =!= col("corpus_id"))
    else scored
  }

  /** IVFPQ: coarse cells route candidates, PQ codes score them — the
    * standard composition when the corpus is too large to ADC-score
    * every code per query. `codes` must carry a cell assignment
    * (`cellCol`, from [[Clustering.kmeans]] with the same `coarse`
    * centroids); each query probes its `nProbe` nearest coarse cells
    * (micro-rounded L2, ties to the smaller cell index — the
    * [[Similarity.ivfTopK]] probe rule) and only those cells' codes are
    * scored. Work per query drops from |corpus| to the probed cells'
    * mass; recall follows the probe coverage. */
  def searchTopKIvf(queries: DataFrame, codes: DataFrame, qId: String,
                    cId: String, qVec: String, books: Codebooks,
                    coarse: Array[Array[Double]], nProbe: Int, k: Int,
                    cellCol: String = "cluster",
                    codeCol: String = "pq_code",
                    excludeSelf: Boolean = true): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    require(k >= 1, s"k must be >= 1, got $k")
    val qv = transform(col(qVec), _.cast("double"))
    val probed = slice(array_sort(array(coarse.zipWithIndex.map {
      case (c, i) =>
        struct(Clustering.microL(Clustering.sqDist(qv, c)).as("d"),
          lit(i).as("c"))
    }: _*)), 1, nProbe)
    val q = queries.filter(col(qVec).isNotNull)
      .select(col(qId).as("query_id"), dtabCol(qv, books).as("__dtab"),
        explode(probed).as("__probe"))
      .select(col("query_id"), col("__dtab"),
        col("__probe").getField("c").as(cellCol))
    val dist = distCol(col("__dtab"), col(codeCol), books.m)
    val scored = codes.filter(col(codeCol).isNotNull)
      .select(col(cId).as("corpus_id"), col(codeCol), col(cellCol))
      .join(broadcast(q), Seq(cellCol))
      .select(col("query_id"), col("corpus_id"), dist.as("adc_dist"))
    val filtered =
      if (excludeSelf) scored.filter(col("query_id") =!= col("corpus_id"))
      else scored
    rankTopK(filtered, k, codes.schema(cId).dataType)
  }

  /** Bounded per-query ADC ranking via [[graft.plans.TopKAgg]] — the
    * aggregate holds at most k entries per (query, partition) and
    * partial-merges map-side, so the one exchange carries
    * O(|queries| x k x partitions) rows; the scored candidate mass
    * (|queries| x |corpus| for flat PQ, the probed cells' mass for
    * IVFPQ) is NEVER shuffled. ADC distances are integer LONGs (sums of
    * m micro-rounded table cells), exact as doubles below 2^53, so
    * negating into TopKAgg's `(score DESC, id ASC)` contract reproduces
    * the `(adc_dist ASC, corpus_id ASC)` ranking bit-identically
    * (PqSpec differential vs [[rankTopKWindow]]). Non-integral corpus
    * ids fall back to the window face. */
  private def rankTopK(scored: DataFrame, k: Int,
                       idType: org.apache.spark.sql.types.DataType)
      : DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType,
      ShortType}
    val integral = idType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!integral) return rankTopKWindow(scored, k)
    val topAgg = GraftColumnBridge.column(graft.plans.TopKAgg(
        GraftColumnBridge.expression(negate(col("adc_dist")).cast("double")),
        GraftColumnBridge.expression(col("corpus_id").cast("long")),
        k).toAggregateExpression())
    scored.groupBy(col("query_id")).agg(topAgg.as("__top"))
      .select(col("query_id"),
        posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("query_id"),
        col("__e.id").cast(idType).as("corpus_id"),
        negate(col("__e.score")).cast("long").as("adc_dist"),
        (col("__pos") + 1).as("rank"))
  }

  /** Rank-window face — shuffles every scored candidate into per-query
    * partitions, so it is only the fallback for non-integral corpus ids
    * and the differential reference in PqSpec. */
  private[graft] def rankTopKWindow(scored: DataFrame, k: Int)
      : DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
