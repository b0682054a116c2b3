package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Upper-triangle gram accumulator: d(d+1)/2 running integer pair-product
  * sums, updated per row in one tight loop over the row's own quantized
  * vector. The aggregate shape replaces the explode-then-hash-aggregate
  * plan (d²/2 generated rows PER INPUT ROW, each paying a hash-map probe)
  * with straight array arithmetic; partial buffers merge by element-wise
  * addition, so the shuffle is O(partitions · d²) longs regardless of
  * corpus size — same asymptotics as the explode shape, ~an order of
  * magnitude less constant-factor work.
  */
final class GramBuffer(val d: Int) {
  val sums = new Array[Long](d * (d + 1) / 2)

  def add(q: Array[Long]): Unit = {
    var base = 0
    var i = 0
    while (i < d) {
      val qi = q(i)
      var j = i
      while (j < d) {
        sums(base + j - i) += qi * q(j)
        j += 1
      }
      base += d - i
      i += 1
    }
  }

  def merge(other: GramBuffer): Unit = {
    var i = 0
    while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
  }
}

/** `gramMatrix(quantizedVec, d)` — the corpus second moment Σ q·qᵀ as one
  * aggregate value: an array of (i, j, p) structs for the upper triangle.
  * Integer arithmetic keeps the result exactly associative (bit-identical
  * under any partitioning), which is what lets a DuckDB oracle check it.
  */
case class GramMatrix(
    vec: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer] with UnaryLike[Expression] {

  require(d > 0, "dimension must be positive")

  override def child: Expression = vec
  override def prettyName: String = "gram_matrix"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("p", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): GramBuffer = new GramBuffer(d)

  override def update(buffer: GramBuffer, input: InternalRow): GramBuffer = {
    val v = vec.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray()
      require(arr.length == d,
        s"gram_matrix expected a $d-dim vector, got ${arr.length}")
      buffer.add(arr)
    }
    buffer
  }

  override def merge(buffer: GramBuffer, other: GramBuffer): GramBuffer = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: GramBuffer): Any = {
    val out = new Array[Any](buffer.sums.length)
    var base = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(base + j - i) =
          new GenericInternalRow(Array[Any](i, j, buffer.sums(base + j - i)))
        j += 1
      }
      base += d - i
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: GramBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.sums.length * 8)
    bb.putInt(buffer.d)
    var i = 0
    while (i < buffer.sums.length) { bb.putLong(buffer.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new GramBuffer(bb.getInt())
    var i = 0
    while (i < buf.sums.length) { buf.sums(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramMatrix =
    copy(vec = newChild)
}

object GramMatrix {
  /** Column wrapper: `df.agg(gramMatrix(quantized, d))`. */
  def gramMatrix(vec: Column, d: Int): Column =
    GraftSqlBridge.column(
      GramMatrix(GraftSqlBridge.expression(vec), d).toAggregateExpression())
}
