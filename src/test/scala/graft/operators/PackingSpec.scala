package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingSpec extends SparkSpec {

  private def docs(n: Int) =
    df("doc_id BIGINT, tokens BIGINT",
      (1 to n).map(i => Row(i.toLong, (i % 97 + 3).toLong)): _*)

  test("concatChunks: sharded prefix sum == single global window") {
    val d = docs(5000)
    val packed = Packing.concatChunks(d, "doc_id", "tokens",
      budget = 1024L, nShards = 16)
    // reference: ONE global window (the thing that doesn't scale)
    val g = Window.orderBy(Sampling.bucketHash(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expect = d
      .withColumn("__pfx", coalesce(sum(col("tokens")).over(g), lit(0L)))
      .select(col("doc_id"), expr("__pfx div 1024").as("chunk_id"),
        pmod(col("__pfx"), lit(1024L)).as("chunk_offset"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val got = packed.collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
  }

  test("concatChunks: chunk assignment is layout-independent " +
    "(repartitioned input packs identically)") {
    val d = docs(3000)
    def packedMap(in: org.apache.spark.sql.DataFrame) =
      Packing.concatChunks(in, "doc_id", "tokens", budget = 2048L)
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
        .toMap
    assert(packedMap(d.repartition(13)) == packedMap(d),
      "packing must be a pure function of (id, tokens), not layout")
  }

  test("concatChunks with groupCols: chunks never span groups, and each " +
    "group packs exactly as it would alone") {
    val d = df("doc_id BIGINT, tokens BIGINT, g STRING",
      (1 to 3000).map(i =>
        Row(i.toLong, (i % 97 + 3).toLong, s"g${i % 3}")): _*)
    val packed = Packing.concatChunks(d, "doc_id", "tokens",
        budget = 1024L, nShards = 16, groupCols = Seq("g"))
      .collect()
      .map(r => r.getLong(1) -> ((r.getString(0), r.getLong(3), r.getLong(4))))
      .toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val alone = Packing.concatChunks(
          d.filter(col("g") === g), "doc_id", "tokens",
          budget = 1024L, nShards = 16)
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      alone.foreach { case (id, (chunk, off)) =>
        assert(packed(id) == ((g, chunk, off)),
          s"doc $id in $g: grouped ${packed(id)} vs alone ($chunk, $off)")
      }
    }
  }

  test("concatChunks + chunkStats: chunks are budget-dense (every chunk " +
    "but the last starts full), offsets stay below budget") {
    val d = docs(2000)
    val budget = 512L
    val packed = Packing.concatChunks(d, "doc_id", "tokens", budget)
    assert(packed.filter(col("chunk_offset") >= budget).count() == 0)
    val stats = Packing.chunkStats(packed, "tokens", budget)
      .orderBy(col("chunk_id")).collect()
    val totalTokens = d.agg(sum("tokens")).head().getLong(0)
    assert(stats.map(_.getAs[Long]("tokens")).sum == totalTokens)
    // every chunk except the last must reach the budget boundary
    // (tokens + carry-in from the previous straddler >= budget); a cheap
    // proxy: chunk ids are contiguous from 0
    val idsSeen = stats.map(_.getAs[Long]("chunk_id"))
    assert(idsSeen.sameElements(idsSeen.indices.map(_.toLong)))
    // a chunk exists iff a doc STARTS in it: the final boundary-straddling
    // doc can spill into a chunk no doc starts in, so the count is either
    // floor or ceil of total/budget
    val floorChunks = (totalTokens / budget).toInt
    assert(idsSeen.length == floorChunks ||
      idsSeen.length == math.ceil(totalTokens.toDouble / budget).toInt)
  }

  test("concatChunks: carryCols ride through unchanged and the packing " +
    "is identical with or without them") {
    val d = docs(1000).withColumn("payload",
      concat(lit("text-"), col("doc_id")))
    val bare = Packing.concatChunks(d, "doc_id", "tokens", budget = 512L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val carried = Packing.concatChunks(d, "doc_id", "tokens",
      budget = 512L, carryCols = Seq("payload"))
    val rows = carried.collect().map(r =>
      r.getLong(0) -> ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    rows.foreach { case (id, (payload, chunk, off)) =>
      assert(payload == s"text-$id", s"payload corrupted for $id")
      assert(bare(id) == ((chunk, off)),
        s"carrying a column changed the packing of $id")
    }
  }

  test("concatChunks fails fast on a non-integral id (a string id would " +
    "hash to null shards and silently drop every row)") {
    val d = df("doc_id STRING, tokens BIGINT", Row("a", 5L))
    val e = intercept[IllegalArgumentException] {
      Packing.concatChunks(d, "doc_id", "tokens", budget = 512L)
    }
    assert(e.getMessage.contains("integral"))
  }
}
