package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: one pass over every declared query counting Spark jobs and
  * wall seconds (single rep — a ranking signal, not a benchmark). The
  * r20 CC fast path came from exactly this attribution (43 jobs on a
  * 394-edge input); this generalizes the question to the whole surface. */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

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

    val only = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // warm the session (codegen caches, parquet footers) on one cheap gate
    graft.SparkEntry.queries("q_p1_rename")(spark, dir).count()
    val rows = names.flatMap { n =>
      try {
        dropAll()
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Some((n, sec, jobs.get() - j0))
      } catch {
        case e: Throwable =>
          println(s"JOBPROBE-ERR $n: ${e.getMessage.take(120)}"); None
      }
    }
    println(f"${"query"}%-30s ${"sec"}%8s jobs")
    rows.sortBy(-_._3).foreach { case (n, s, j) =>
      println(f"JOBPROBE $n%-30s $s%8.3f  $j%4d")
    }
    println(f"JOBPROBE-TOTAL sec=${rows.map(_._2).sum}%.1f " +
      f"jobs=${rows.map(_._3).sum}")
    spark.stop()
  }
}
