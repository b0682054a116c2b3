package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k buffer: payloads ranked by (score desc, payload asc),
  * capacity k. Kept as two primitive arrays with ordered insertion — k is
  * small (5–100), so O(k) insert beats heap constant factors and
  * serializes trivially.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val payloads = new Array[Long](k)
  var size = 0

  private def ranksHigher(s1: Double, p1: Long, s2: Double, p2: Long): Boolean =
    s1 > s2 || (s1 == s2 && p1 < p2)

  def add(s: Double, p: Long): Unit = {
    if (size == k && !ranksHigher(s, p, scores(k - 1), payloads(k - 1))) return
    var i = math.min(size, k - 1)
    while (i > 0 && ranksHigher(s, p, scores(i - 1), payloads(i - 1))) {
      scores(i) = scores(i - 1); payloads(i) = payloads(i - 1); i -= 1
    }
    scores(i) = s; payloads(i) = p
    if (size < k) size += 1
  }

  def merge(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.scores(i), other.payloads(i)); i += 1 }
  }
}

/** Top-k payloads by score as a `TypedImperativeAggregate` — the engine's
  * bounded-heap aggregate (SURVEY §7.5 "LLM ops v2"). Versus
  * `row_number().over(Window.partitionBy(g).orderBy(score))` + filter, the
  * aggregate gets map-side partial aggregation: each input partition
  * contributes at most k entries per group to the shuffle instead of every
  * row — for a kNN join over n² candidate pairs that turns the exchange
  * from O(n²) rows into O(groups · k · partitions).
  *
  * Output: array of payloads in rank order (score desc, payload asc — the
  * tie-break keeps results deterministic and oracle-friendly).
  */
case class TopKByScore(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def left: Expression = score
  override def right: Expression = payload
  override def prettyName: String = "top_k_by_score"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null)
      buffer.add(s.asInstanceOf[Double], p.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.payloads.take(buffer.size))

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.size * 16)
    bb.putInt(buffer.k).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i)); bb.putLong(buffer.payloads(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      buf.scores(i) = bb.getDouble(); buf.payloads(i) = bb.getLong(); i += 1
    }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(score = newLeft, payload = newRight)
}

object TopKByScore {
  /** Column wrapper: `groupBy(g).agg(topKByScore(score, id, k))`. */
  def topKByScore(score: Column, payload: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKByScore(
        GraftSqlBridge.expression(score),
        GraftSqlBridge.expression(payload),
        k).toAggregateExpression())
}

/** Bounded top-k buffer over (count: Long, term: String) entries, ranked by
  * (count desc, term asc) — the vocabulary-rank order. Same ordered-insert
  * shape as [[TopKBuffer]]; terms are stored as owned [[UTF8String]] copies
  * (eval-input backing buffers are reused by Spark), cloned at the point of
  * ACTUAL insertion — comparing against a transient string is safe, so the
  * Heaps'-law-sized majority of inputs that never enter the top-k cost no
  * allocation.
  */
final class TopTermsBuffer(val k: Int) {
  val counts = new Array[Long](k)
  val terms = new Array[UTF8String](k)
  var size = 0

  private def ranksHigher(c1: Long, t1: UTF8String, c2: Long, t2: UTF8String): Boolean =
    c1 > c2 || (c1 == c2 && t1.compareTo(t2) < 0)

  def add(c: Long, t: UTF8String): Unit = {
    if (size == k && !ranksHigher(c, t, counts(k - 1), terms(k - 1))) return
    var i = math.min(size, k - 1)
    while (i > 0 && ranksHigher(c, t, counts(i - 1), terms(i - 1))) {
      counts(i) = counts(i - 1); terms(i) = terms(i - 1); i -= 1
    }
    counts(i) = c; terms(i) = t.clone()
    if (size < k) size += 1
  }

  def merge(other: TopTermsBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.counts(i), other.terms(i)); i += 1 }
  }
}

/** Top-k (term, count) pairs by (count desc, term asc) as a
  * `TypedImperativeAggregate` — the bounded vocabulary selector. Replaces
  * `row_number().over(Window.orderBy(n.desc, term))` over the aggregated
  * term domain: that window has no partition key, so Spark funnels the
  * ENTIRE distinct-term domain (Heaps'-law-growing — 10⁸–10⁹ terms at
  * corpus scale) through one task. Here each partition of the term-count
  * table contributes at most k entries to the final merge, so the global
  * step sees ≤ partitions·k rows regardless of vocabulary size.
  *
  * Output: `array<struct<term:string, n:bigint>>` in rank order — position
  * + 1 is the 1-based vocabulary id the window form produced.
  */
case class TopTermsByCount(
    count: Expression,
    term: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopTermsBuffer] with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def left: Expression = count
  override def right: Expression = term
  override def prettyName: String = "top_terms_by_count"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopTermsBuffer = new TopTermsBuffer(k)

  override def update(buffer: TopTermsBuffer, input: InternalRow): TopTermsBuffer = {
    val c = count.eval(input)
    val t = term.eval(input)
    if (c != null && t != null)
      buffer.add(c.asInstanceOf[Long], t.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: TopTermsBuffer, other: TopTermsBuffer): TopTermsBuffer = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: TopTermsBuffer): Any = {
    val rows = new Array[Any](buffer.size)
    var i = 0
    while (i < buffer.size) {
      rows(i) = new GenericInternalRow(Array[Any](buffer.terms(i), buffer.counts(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopTermsBuffer): Array[Byte] = {
    var bytes = 8
    var i = 0
    while (i < buffer.size) { bytes += 12 + buffer.terms(i).numBytes(); i += 1 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buffer.k).putInt(buffer.size)
    i = 0
    while (i < buffer.size) {
      bb.putLong(buffer.counts(i))
      val tb = buffer.terms(i).getBytes
      bb.putInt(tb.length).put(tb)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopTermsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopTermsBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      buf.counts(i) = bb.getLong()
      val tb = new Array[Byte](bb.getInt())
      bb.get(tb)
      buf.terms(i) = UTF8String.fromBytes(tb)
      i += 1
    }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopTermsByCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopTermsByCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopTermsByCount =
    copy(count = newLeft, term = newRight)
}

object TopTermsByCount {
  /** Column wrapper: `.agg(topTermsByCount(n, term, k))` →
    * `array<struct<term,n>>` ranked (n desc, term asc).
    */
  def topTermsByCount(count: Column, term: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopTermsByCount(
        GraftSqlBridge.expression(count),
        GraftSqlBridge.expression(term),
        k).toAggregateExpression())
}
