package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomSpec extends SparkSpec {

  private def keys(ks: String*) =
    df("k STRING", ks.map(Row(_)): _*)

  test("no false negatives: every built key probes true") {
    val members = (0 until 300).map(i => s"key-$i")
    val words = Bloom.build(keys(members: _*), col("k"), numBits = 1 << 12)
    val hits = keys(members: _*)
      .filter(Bloom.mightContain(col("k"), words)).count()
    assert(hits == members.size.toLong)
  }

  test("false-positive rate near theory at 13.7 bits/key") {
    val members = (0 until 300).map(i => s"key-$i")
    val words = Bloom.build(keys(members: _*), col("k"), numBits = 1 << 12)
    val probes = (0 until 2000).map(i => s"other-$i")
    val fp = keys(probes: _*)
      .filter(Bloom.mightContain(col("k"), words)).count()
    // theory: (1 - e^(-7*300/4096))^7 ~ 0.6%; allow 4x slack on 2000 draws
    assert(fp <= 2000 * 0.006 * 4, s"false positives: $fp / 2000")
  }

  test("null keys set no bits and probe as a miss, not null") {
    val words = Bloom.build(
      df("k STRING", Row("a"), Row(null), Row("b")), col("k"), 1 << 8)
    val got = df("k STRING", Row(null.asInstanceOf[String]))
      .select(Bloom.mightContain(col("k"), words).as("hit")).collect()
    assert(got.head.getBoolean(0) == false)
  }

  test("build is layout-stable: repartitioned input gives identical words") {
    val ks = keys((0 until 100).map(i => s"k$i"): _*)
    val a = Bloom.build(ks, col("k"), 1 << 10)
    val b = Bloom.build(ks.repartition(7), col("k"), 1 << 10)
    assert(a.sameElements(b))
  }

  test("dedupAgainstBloom == dedupAgainst (differential, mixed batch)") {
    val docs = (0L until 60L).map(i => Row(i, s"corpus doc $i"))
    val corpus = df("doc_id BIGINT, text STRING", docs: _*)
    val idx = IncrementalDedup.exactIndex(corpus, "text")
    // batch: 20 already-in-corpus, 20 new with internal dups, 10 fresh
    val batch = df("doc_id BIGINT, text STRING",
      ((100L until 120L).map(i => Row(i, s"corpus doc ${i - 100}")) ++
       (200L until 220L).map(i => Row(i, s"new doc ${(i - 200) / 2}")) ++
       (300L until 310L).map(i => Row(i, s"fresh $i"))): _*)
    val exact = IncrementalDedup.dedupAgainst(batch, idx, "text", "doc_id")
      .collect().map(_.getLong(0)).sorted
    val bloomed = IncrementalDedup.dedupAgainstBloom(
        batch, idx, "text", "doc_id", numBits = 1 << 10)
      .collect().map(_.getLong(0)).sorted
    assert(bloomed.sameElements(exact))
    // and even with a saturated filter (every probe positive) the exact
    // verify still gives the right answer — the filter only routes
    val tiny = IncrementalDedup.dedupAgainstBloom(
        batch, idx, "text", "doc_id", numBits = 64, numHashes = 1)
      .collect().map(_.getLong(0)).sorted
    assert(tiny.sameElements(exact))
  }

  test("empty index: everything is a row-local miss, within-batch dedup only") {
    val empty = IncrementalDedup.exactIndex(
      df("doc_id BIGINT, text STRING"), "text")
    val batch = df("doc_id BIGINT, text STRING",
      Row(1L, "x"), Row(2L, "x"), Row(3L, "y"))
    val kept = IncrementalDedup.dedupAgainstBloom(
        batch, empty, "text", "doc_id", numBits = 1 << 8)
      .collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(1L, 3L)))
  }
}
