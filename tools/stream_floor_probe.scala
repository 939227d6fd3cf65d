// Stage attribution for the two long-standing top-5 streaming gates
// (r18 verdict item 7): is their quiet cost irreducible micro-batch
// machinery (trigger + state-store commit cycles) or reducible prep?
// Run via spark-shell on a QUIET machine (never concurrently with
// bench/scale runs):
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 8g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/stream_floor_probe.scala
// Prints per-batch durationMs breakdowns (triggerExecution, addBatch,
// queryPlanning, walCommit, commitOffsets, getBatch, latestOffset) per
// gate rep, plus wall times, then exits.
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.jdk.CollectionConverters._

val sf = "/root/testdata/sf0.1"
val progress =
  scala.collection.mutable.ArrayBuffer.empty[(String, Long, Map[String, Long])]
spark.streams.addListener(new StreamingQueryListener {
  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit =
    progress += ((e.progress.name, e.progress.batchId,
      e.progress.durationMs.asScala.map { case (k, v) =>
        k -> v.toLong }.toMap))
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
})

def runGate(name: String): Double = {
  val t0 = System.nanoTime()
  graft.SparkEntry.queries(name)(spark, sf).count()
  (System.nanoTime() - t0) / 1e9
}

for (gate <- Seq("q_stream_join_xbatch", "q_stream_decontam")) {
  runGate(gate) // warm-up (pays the one-time fixture/gram build)
  progress.clear()
  val walls = (1 to 3).map(_ => runGate(gate))
  // listener events are async; give the final batch's event time to land
  Thread.sleep(1500)
  println(s"== $gate walls: ${walls.map(w => f"$w%.2f").mkString(", ")} s " +
    f"(min ${walls.min}%.2f)")
  val snap = progress.toVector
  val byQuery = snap.groupBy(_._1)
  val keys = Seq("triggerExecution", "addBatch", "queryPlanning",
    "walCommit", "commitOffsets", "getBatch", "latestOffset")
  byQuery.toSeq.sortBy(_._1).foreach { case (q, rows) =>
    println(s"  query $q: ${rows.size} batches")
    rows.sortBy(_._2).foreach { case (_, bid, d) =>
      println(s"    batch $bid: " + keys.map(k =>
        s"$k=${d.getOrElse(k, -1L)}").mkString(" "))
    }
    val trig = rows.map(_._3.getOrElse("triggerExecution", 0L)).sum
    val add = rows.map(_._3.getOrElse("addBatch", 0L)).sum
    println(f"    totals: triggerExecution ${trig / 1000.0}%.2f s, " +
      f"addBatch ${add / 1000.0}%.2f s, " +
      f"non-addBatch machinery ${(trig - add) / 1000.0}%.2f s")
  }
}
System.exit(0)
