package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scratch probe (not part of the library surface).
  * r20: stage-level attribution for the top bench queries — where inside
  * each multi-second gate does the time actually go? Bench-identical
  * session shape (local[32], 32 shuffle partitions, UTC, no UI). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import graft.core.Tables
    import graft.operators._

    // job counter: how many Spark jobs does a stage launch?
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobs.incrementAndGet()
      })

    def dropAll(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def t(label: String, reps: Int = 3)(f: => Any): Unit = {
      val best = (1 to reps).map { _ =>
        dropAll()
        val j0 = jobs.get()
        val s = System.nanoTime(); f
        val d = (System.nanoTime - s) / 1e9
        (d, jobs.get() - j0)
      }.minBy(_._1)
      println(f"PROBE $label%-44s ${best._1}%7.3f s  ${best._2}%3d jobs")
    }

    val emb = Tables.embeddings(spark, dir)
    emb.count(); Tables.documents(spark, dir).count()

    println("== kmeans / pq train anatomy ==")
    t("km: init orderBy.limit collect") {
      emb.select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("__v"))
        .orderBy(col("vec_id")).limit(4).collect()
    }
    locally {
      val vec = transform(col("embedding"), _.cast("double"))
      val cents = emb.select(col("vec_id"), vec.as("__v"))
        .orderBy(col("vec_id")).limit(4)
        .collect().map(_.getSeq[Double](1).toArray)
      // Clustering.assign's exact expression shape, inlined (private)
      def microL(c: org.apache.spark.sql.Column) =
        floor(c * lit(1e6) + lit(0.5)).cast("long")
      def sqDist(v: org.apache.spark.sql.Column, c: Array[Double]) =
        aggregate(zip_with(v, typedlit(c.toSeq),
          (x, cc) => (x - cc) * (x - cc)), lit(0.0), (acc, d) => acc + d)
      def assign(v: org.apache.spark.sql.Column,
                 cs: Array[Array[Double]]) =
        array_min(array(cs.zipWithIndex.map { case (c, i) =>
          struct(microL(sqDist(v, c)).as("d"), lit(i).as("c"))
        }: _*)).getField("c")
      t("km: ONE iteration (assign+meanPool+collect)") {
        val assigned = emb.select(vec.as("__km_v"),
          assign(vec, cents).as("__km_c"))
        Embeddings.meanPoolLong(assigned, Seq("__km_c"), "__km_v").collect()
      }
      // same literals twice: second call separates codegen/plan compile
      // from execution
      t("km: SAME iteration again (warm plan)") {
        val assigned = emb.select(vec.as("__km_v"),
          assign(vec, cents).as("__km_c"))
        Embeddings.meanPoolLong(assigned, Seq("__km_c"), "__km_v").collect()
      }
    }
    t("pq: train(m=8,k=8,iter=2)") {
      val e = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
      Pq.train(e, "vec_id", "vec", m = 8, k = 8, maxIter = 2)
    }
    locally {
      val e = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
      val books = Pq.train(e, "vec_id", "vec", m = 8, k = 8, maxIter = 2)
      t("pq: encode only (count)") {
        Pq.encode(e, "vec", books).count()
      }
      t("pq: search from encoded (count)") {
        val codes = Pq.encode(e, "vec", books)
        val queries = e.filter(pmod(col("vec_id"), lit(25L)) === 0)
        Pq.searchTopK(queries, codes, "vec_id", "vec_id", "vec", books,
          k = 3).count()
      }
    }

    println("== pca anatomy ==")
    locally {
      val base = emb.select(col("vec_id").as("__id"),
        transform(col("embedding"), _.cast("double")).as("__v"))
      import spark.implicits._
      val Dec = "decimal(30,12)"
      val d = 64
      val mu = Array.fill(64)(0.1)
      val nTri = d * (d + 1) / 2
      t("pca: covariance mapPartitions pass") {
        base.select(col("__v"))
          .mapPartitions { it =>
            val acc = Array.fill(nTri)(java.math.BigDecimal.ZERO)
            var any = false
            val xc = Array.ofDim[Double](d)
            it.foreach { row =>
              any = true
              val arr = row.getSeq[Double](0)
              var i = 0
              while (i < d) { xc(i) = arr(i) - mu(i); i += 1 }
              var pos = 0
              i = 0
              while (i < d) {
                var j = i
                while (j < d) {
                  val p = org.apache.spark.sql.types.Decimal(xc(i) * xc(j))
                  p.changePrecision(30, 12)
                  acc(pos) = acc(pos).add(p.toJavaBigDecimal)
                  pos += 1; j += 1
                }
                i += 1
              }
            }
            if (!any) Iterator.empty
            else acc.iterator.zipWithIndex.map { case (bd, p) =>
              (p, scala.math.BigDecimal(bd))
            }
          }
          .toDF("pos", "partial")
          .groupBy(col("pos"))
          .agg((sum(col("partial")).cast("double") / lit(2000.0)).as("c"))
          .collect()
      }
      val compDf = (for (ci <- 0 until 4; dim <- 0 until d)
        yield (ci, dim, 0.5)).toDF("comp", "dim", "cv")
      val muLit = typedlit(mu.toSeq)
      val centered = zip_with(col("__v"), muLit, (x, m) => x - m)
      t("pca: projection pass") {
        base
          .select(col("__id"), posexplode(centered).as(Seq("dim", "v")))
          .join(broadcast(compDf), "dim")
          .groupBy(col("__id"), col("comp"))
          .agg(sum((col("v") * col("cv")).cast(Dec)).cast("double")
            .as("value"))
          .count()
      }
    }

    println("== connected components anatomy ==")
    locally {
      // a realistic small pair set, materialized driver-side so dropAll
      // between reps cannot kill it (plain createDataFrame, no blocks)
      import spark.implicits._
      val pairRows = Clustering.semDupPairs(emb, "vec_id", "embedding",
          4, 2, 0.4).select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val pairs = pairRows.toDF("id_a", "id_b")
      println(s"  (pair count: ${pairRows.size})")
      t("cc: connectedComponents on checkpointed pairs") {
        DupClusters.connectedComponents(pairs, "id_a", "id_b").count()
      }
      t("cc: dedupByCluster on checkpointed pairs") {
        DupClusters.dedupByCluster(emb, "vec_id", pairs, "id_a", "id_b")
          .count()
      }
    }

    println("== semdedup sharded anatomy ==")
    t("sharded: FULL pairs (shard=MaxInt)") {
      Clustering.semDupPairsSharded(emb, "vec_id", "embedding",
        Int.MaxValue, 4, 2, 0.4).count()
    }
    t("sharded: FULL semDedupSharded (=query)") {
      Clustering.semDedupSharded(emb, "vec_id", "embedding",
        Int.MaxValue, 4, 2, 0.4).count()
    }
    t("flat: FULL semDedup (=query)") {
      Clustering.semDedup(emb, "vec_id", "embedding", 4, 2, 0.4).count()
    }

    println("== curate_jaccard anatomy ==")
    locally {
      val docs = Tables.documents(spark, dir)
      t("cj: dedup+score+sample count") {
        val deduped = Dedup.exact(docs, "text", "doc_id")
        val scored = deduped.withColumn("q",
          graft.functions.TextFunctions.qualityScore(col("text")))
        Sampling.bernoulliSample(scored.filter(col("q") >= 0.2),
          "doc_id", 0.9, 5L).count()
      }
      t("cj: jaccardPairs t=0.8 on raw docs") {
        Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8).count()
      }
      t("cj: FULL q_curate_jaccard") {
        SparkEntry.queries("q_curate_jaccard")(spark, dir).count()
      }
      t("cj: FULL q_curate (lsh face)") {
        SparkEntry.queries("q_curate")(spark, dir).count()
      }
      t("cj: packing alone (concatChunks)") {
        Packing.concatChunks(docs.select(col("doc_id"), col("n_chars"),
            col("lang"), col("text")),
          "doc_id", "n_chars", 16384L, 5L, groupCols = Seq("lang"),
          carryCols = Seq("text")).count()
      }
    }

    println("== m3 anatomy ==")
    t("m3: FULL query") {
      SparkEntry.queries("q_m3_rf_lr")(spark, dir).count()
    }

    spark.stop()
  }
}

/** Dev-only: dump .explain("formatted") for the r20-touched queries to
  * plans/r20/<query>_<tag>.txt (tag = args(0), "before" or "after"). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("after")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val targets = Seq("q_pca", "q_semdedup", "q_semdedup_sharded",
      "q_pq_ann", "q_minhash_lsh_pairs", "q_dup_clusters",
      "q_group_split", "q_cluster_dedup",
      // session 2 additions
      "q_pagerank", "q_ppr", "q_pagerank_weighted", "q_kcore",
      "q_curate_jaccard", "q_lsh_tuning", "q_containment", "q_kmeans",
      "q_ivf_kmeans_ann")
    targets.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"plans/r20/${name}_$tag.txt"),
        plan.getBytes("UTF-8"))
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      println(s"dumped $name")
    }
    spark.stop()
  }
}
