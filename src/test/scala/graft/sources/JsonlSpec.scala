package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class JsonlSpec extends SparkSpec {

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("JSONL round-trip: write, read with explicit schema, values equal") {
    val d = df("doc_id BIGINT, text STRING, lang STRING",
      Row(1L, "hello world", "en"), Row(2L, "bon jour", "fr"),
      Row(3L, null, "de"))
    val dir = tmpDir("jsonl-rt") + "/out"
    AuxSources.writeJsonl(d, dir)
    val back = AuxSources.readJsonl(spark, dir,
      "doc_id BIGINT, text STRING, lang STRING")
    val (good, bad) = AuxSources.jsonlSplit(back)
    assert(bad.count() == 0L)
    val got = good.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2)))
      .toSet
    assert(got == Set((1L, Some("hello world"), "en"),
      (2L, Some("bon jour"), "fr"), (3L, None, "de")))
  }

  test("corrupt lines land in _corrupt_record, good rows parse on") {
    val dir = tmpDir("jsonl-bad")
    val lines = Seq(
      """{"doc_id": 1, "text": "ok one"}""",
      """{"doc_id": 2 "text": "missing comma"""", // malformed
      """not json at all""",
      """{"doc_id": 3, "text": "ok two"}""")
    Files.write(Paths.get(dir, "part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val back = AuxSources.readJsonl(spark, dir,
      "doc_id BIGINT, text STRING")
    val (good, bad) = AuxSources.jsonlSplit(back)
    assert(good.collect().map(_.getLong(0)).sorted.sameElements(
      Array(1L, 3L)))
    val badLines = bad.collect().map(_.getString(0))
    assert(badLines.length == 2)
    assert(badLines.exists(_.contains("missing comma")))
    assert(badLines.exists(_.contains("not json")))
  }

  test("type mismatch is corrupt, not silently nulled") {
    val dir = tmpDir("jsonl-type")
    val lines = Seq(
      """{"doc_id": "not-a-number", "text": "x"}""",
      """{"doc_id": 7, "text": "y"}""")
    Files.write(Paths.get(dir, "part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val (good, bad) = AuxSources.jsonlSplit(
      AuxSources.readJsonl(spark, dir, "doc_id BIGINT, text STRING"))
    assert(good.collect().map(_.getLong(0)).sameElements(Array(7L)))
    assert(bad.count() == 1L)
  }

  test("missing fields are null, extra fields ignored — both still good " +
    "rows (schema evolution between crawls)") {
    val dir = tmpDir("jsonl-evol")
    val lines = Seq(
      """{"doc_id": 1}""",
      """{"doc_id": 2, "text": "t", "new_field": true}""")
    Files.write(Paths.get(dir, "part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val (good, bad) = AuxSources.jsonlSplit(
      AuxSources.readJsonl(spark, dir, "doc_id BIGINT, text STRING"))
    assert(bad.count() == 0L)
    val got = good.collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> None, 2L -> Some("t")))
  }
}
