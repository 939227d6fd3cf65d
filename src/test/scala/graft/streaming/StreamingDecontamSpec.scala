package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Decontam

/** The row-local decontamination tag is stateless, so it must run
  * verbatim on a stream AND agree with the batch join face — both pinned
  * here (the q_decontam gates cover the join face against DuckDB). */
class StreamingDecontamSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val benchText = "the hidden iceberg order rests at the bid"
  private def corpusRows = Seq(
    (1L, "the hidden iceberg order rests at the bid today"), // overlaps
    (2L, "completely unrelated text about gardens and tea"),
    (3L, "an iceberg order rests at the bid"))                // overlaps

  test("tagContamination on a stream equals the batch join face " +
    "(zero-overlap docs tagged 0, overlaps counted identically)") {
    val bench = df("q STRING", org.apache.spark.sql.Row(benchText))
    val grams = Decontam.benchGramSet(bench, "q")
    assert(grams.nonEmpty)

    val batchDocs = corpusRows.toDF("doc_id", "text")
    val batchTagged = Decontam
      .tagContamination(batchDocs, grams, "text")
      .select(col("doc_id"), col("n_overlap"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // agreement with the join face on overlapping docs
    val joinFace = Decontam.contaminationScores(batchDocs, bench,
        "doc_id", "text", benchTextCol = "q")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batchTagged(2L) == 0 && !joinFace.contains(2L),
      "zero-overlap doc must tag 0 and be absent from the join face")
    joinFace.foreach { case (id, n) =>
      assert(batchTagged(id).toLong == n,
        s"doc $id: tag ${batchTagged(id)} != join face $n")
    }

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("event_time", "doc_id", "text")
    val out = Decontam.tagContamination(docs, grams, "text")
      .select(col("doc_id"), col("n_overlap"))
    val q = StreamingOi.startMemorySink(out, "decontam_test")
    try {
      input.addData(corpusRows.map { case (id, t) =>
        (ts("2024-01-15 10:00:00"), id, t) }: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, n_overlap FROM decontam_test")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(streamed == batchTagged, "stream != batch tagging")
    } finally q.stop()
  }
}
