package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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
