package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  LongType, StructField, StructType}

/** Bounded top-k buffer: at most k (score, id) entries, kept unsorted;
  * the worst entry is located by an O(k) scan only when a replacing
  * insert is attempted (most inserts on a selective stream fail the
  * worst-check in O(1) amortized — they are worse than everything held).
  *
  * Ordering contract — identical to a window
  * `orderBy(score.desc_nulls_last, id.asc)`:
  * higher score is better; a null score is worse than any score; ties
  * (equal scores, or two nulls) break toward the SMALLER id. Scores must
  * not be NaN (the cosine kernel emits null, never NaN, for degenerate
  * vectors). */
private[plans] final class TopKBuffer(val k: Int) {
  val score = new Array[Double](k)
  val noScore = new Array[Boolean](k)
  val id = new Array[Long](k)
  var n = 0

  /** Is candidate (s, ns, i) strictly better than held entry j? */
  @inline private def better(s: Double, ns: Boolean, i: Long,
                             j: Int): Boolean = {
    if (ns != noScore(j)) !ns
    else if (!ns && s != score(j)) s > score(j)
    else i < id(j)
  }

  def insert(s: Double, ns: Boolean, i: Long): Unit = {
    if (n < k) {
      score(n) = s; noScore(n) = ns; id(n) = i; n += 1
    } else {
      var w = 0
      var j = 1
      while (j < n) { // w = worst held entry
        if (better(score(w), noScore(w), id(w), j)) w = j
        j += 1
      }
      if (better(s, ns, i, w)) {
        score(w) = s; noScore(w) = ns; id(w) = i
      }
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var j = 0
    while (j < other.n) {
      insert(other.score(j), other.noScore(j), other.id(j))
      j += 1
    }
  }

  /** Held indices sorted best-first under the ordering contract. */
  def sortedIndices: Array[Int] = {
    val idx = Array.range(0, n)
    // boxed sort on a <= k array; fine for top-k sized k
    idx.sortWith((a, b) => better(score(a), noScore(a), id(a), b))
  }
}

/** Native bounded top-k aggregate: per group, the k best (score, id)
  * pairs under `(score DESC NULLS LAST, id ASC)`, returned as a sorted
  * `array<struct<score double, id bigint>>`.
  *
  * This is the partial-aggregation replacement for the
  * `row_number().over(Window.partitionBy(group).orderBy(...)) <= k`
  * idiom on LARGE inputs: the window formulation shuffles EVERY scored
  * row to its group's reducer before ranking (for brute-force ANN that
  * is the full |queries| x |corpus| cross product), while this
  * aggregate's partial state is at most k entries per group per
  * partition — map-side combine prunes the stream before the one
  * hash-partitioned exchange, so shuffle volume drops from
  * O(|queries| x |corpus|) to O(|queries| x k x partitions).
  *
  * Rows with a null id are skipped (a corpus id is a key; the ANN
  * operators never produce one). Results are bit-identical to the
  * window idiom — same total order, same deterministic tie-break —
  * which SimilaritySpec asserts differentially. */
case class TopKAgg(left: Expression, right: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def prettyName: String = "graft_top_k"
  override def nullable: Boolean = false
  override def dataType: DataType = TopKAgg.resultType

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val idv = right.eval(input)
    if (idv != null) {
      val sv = left.eval(input)
      if (sv == null) b.insert(0.0, ns = true, idv.asInstanceOf[Long])
      else b.insert(sv.asInstanceOf[Double], ns = false,
        idv.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    b.mergeFrom(other); b
  }

  override def eval(b: TopKBuffer): Any = {
    val idx = b.sortedIndices
    val out = new Array[Any](idx.length)
    var i = 0
    while (i < idx.length) {
      val j = idx(i)
      val s: Any = if (b.noScore(j)) null
                   else java.lang.Double.valueOf(b.score(j))
      out(i) = new GenericInternalRow(
        Array[Any](s, java.lang.Long.valueOf(b.id(j))))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + b.n * 17)
    buf.putInt(b.k).putInt(b.n)
    var j = 0
    while (j < b.n) {
      buf.put(if (b.noScore(j)) 1.toByte else 0.toByte)
      buf.putDouble(b.score(j)).putLong(b.id(j))
      j += 1
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(buf.getInt())
    val n = buf.getInt()
    var j = 0
    while (j < n) {
      val ns = buf.get() == 1
      val s = buf.getDouble()
      val i = buf.getLong()
      b.score(j) = s; b.noScore(j) = ns; b.id(j) = i
      j += 1
    }
    b.n = n
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(left = newLeft, right = newRight)
}

object TopKAgg {
  val resultType: ArrayType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = true),
    StructField("id", LongType, nullable = false))), containsNull = false)
}
