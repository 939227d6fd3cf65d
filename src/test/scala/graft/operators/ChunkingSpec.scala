package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class ChunkingSpec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def referenceChunks(text: String, nibbles: String)
      : Seq[(Long, Seq[String])] = {
    val toks = text.trim.split("\\s+").toSeq
    var idx = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[String])]
    var cur = scala.collection.mutable.ArrayBuffer.empty[String]
    toks.foreach { t =>
      cur += t
      if (nibbles.contains(md5Hex(t).head)) {
        out += ((idx, cur.toSeq)); idx += 1
        cur = scala.collection.mutable.ArrayBuffer.empty[String]
      }
    }
    if (cur.nonEmpty) out += ((idx, cur.toSeq))
    out.toSeq
  }

  test("cdcChunks matches a driver-side reference fold: boundary after " +
    "hash-selected tokens, 0-based chunk ids, content preserved") {
    val text = "the quick brown fox jumps over the lazy dog and runs " +
      "far into the green quiet forest tonight while stars shine"
    val d = df("doc_id BIGINT, text STRING", Row(1L, text))
    // widen the boundary set so a short fixture actually cuts
    val nib = "0123"
    val exp = referenceChunks(text, nib)
    val got = Chunking.cdcChunks(d, "doc_id", "text", nib)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getLong(1), r.getString(3), r.getLong(2)))
    assert(got.length == exp.length,
      s"chunk count ${got.length} != ${exp.length}")
    got.zip(exp).foreach { case ((idx, txt, n), (eIdx, eToks)) =>
      assert(idx == eIdx)
      assert(txt == eToks.mkString(" "))
      assert(n == eToks.length)
    }
  }

  test("edit stability: changing a late token leaves earlier chunks' " +
    "hashes untouched (the content-defined property)") {
    val base = (1 to 200).map(i => s"tok$i").mkString(" ")
    val edited = base.replace("tok190", "EDITED")
    val d = df("doc_id BIGINT, text STRING",
      Row(1L, base), Row(2L, edited))
    val chunks = Chunking.cdcChunks(d, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(4)).toMap
    val baseChunks = chunks.filter(_._1._1 == 1L)
      .map { case ((_, idx), h) => idx -> h }
    val editChunks = chunks.filter(_._1._1 == 2L)
      .map { case ((_, idx), h) => idx -> h }
    // the edit lives in some chunk c; every chunk before c is identical
    val firstDiff = baseChunks.keys.toSeq.sorted
      .find(i => editChunks.get(i) != baseChunks.get(i))
    assert(firstDiff.isDefined, "edit must change at least one chunk")
    val c = firstDiff.get
    assert(c > 0, "fixture too short: edit landed in the first chunk")
    (0L until c).foreach { i =>
      assert(editChunks(i) == baseChunks(i),
        s"chunk $i changed although the edit is in chunk $c")
    }
  }

  test("randomized differential: cdcChunks equals the reference fold on " +
    "50 random documents (varied vocab sizes, repeated tokens, widths)") {
    val rnd = new scala.util.Random(2024)
    val docs = (1 to 50).map { i =>
      val vocab = (1 to (1 + rnd.nextInt(30)))
        .map(v => s"w${rnd.nextInt(40)}")
      val nTok = 1 + rnd.nextInt(120)
      Row(i.toLong, Seq.fill(nTok)(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val d = df("doc_id BIGINT, text STRING", docs: _*)
    val nib = "02ac"
    val got = Chunking.cdcChunks(d, "doc_id", "text", nib)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(3), r.getLong(2))).toMap
    docs.foreach { row =>
      val (id, text) = (row.getLong(0), row.getString(1))
      val exp = referenceChunks(text, nib)
      exp.foreach { case (idx, toks) =>
        val (txt, n) = got((id, idx))
        assert(txt == toks.mkString(" "), s"doc $id chunk $idx text")
        assert(n == toks.length, s"doc $id chunk $idx count")
      }
      assert(got.count(_._1._1 == id) == exp.length,
        s"doc $id chunk count")
    }
  }

  test("cdcChunks rejects non-hex boundary nibbles") {
    val d = df("doc_id BIGINT, text STRING", Row(1L, "a b"))
    intercept[IllegalArgumentException] {
      Chunking.cdcChunks(d, "doc_id", "text", "XYZ")
    }
  }

  // ---- slidingChunks (RAG windowing) ----

  private def sliding(text: String, window: Int, stride: Int)
      : Seq[(Long, Int, String)] =
    Chunking.slidingChunks(
        df("doc_id BIGINT, text STRING", Row(1L, text)),
        "doc_id", "text", window, stride)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getInt(1).toLong, r.getInt(2), r.getString(3))).toSeq

  test("slidingChunks matches a driver-side reference window walk " +
    "(overlap, ragged tail)") {
    val toks = (1 to 11).map(i => s"t$i")
    val got = sliding(toks.mkString(" "), window = 4, stride = 3)
    // reference: starts 0,3,6,9 — last start covers token 10 (ragged 2)
    val exp = Seq(0, 3, 6, 9).zipWithIndex.map { case (st, i) =>
      val w = toks.slice(st, st + 4)
      (i.toLong, w.length, w.mkString(" "))
    }
    assert(got == exp)
  }

  test("slidingChunks boundary counts: n == window gives one full " +
    "chunk; n == window+1 gives two") {
    assert(sliding((1 to 4).map("t" + _).mkString(" "), 4, 2) ==
      Seq((0L, 4, "t1 t2 t3 t4")))
    val two = sliding((1 to 5).map("t" + _).mkString(" "), 4, 2)
    assert(two == Seq((0L, 4, "t1 t2 t3 t4"), (1L, 3, "t3 t4 t5")))
  }

  test("slidingChunks: stride == window tiles without overlap and " +
    "covers every token exactly once") {
    val got = sliding((1 to 10).map("t" + _).mkString(" "), 5, 5)
    assert(got.map(_._3).mkString(" ") == (1 to 10).map("t" + _)
      .mkString(" "))
    assert(got.map(_._2) == Seq(5, 5))
  }

  test("slidingChunks: NULL text yields zero chunks; stride bounds " +
    "are enforced") {
    val d = df("doc_id BIGINT, text STRING", Row(1L, null))
    assert(Chunking.slidingChunks(d, "doc_id", "text", 4, 2).count() == 0)
    intercept[IllegalArgumentException] {
      Chunking.slidingChunks(d, "doc_id", "text", 4, 5) // stride > window
    }
    intercept[IllegalArgumentException] {
      Chunking.slidingChunks(d, "doc_id", "text", 0, 1)
    }
  }
}
