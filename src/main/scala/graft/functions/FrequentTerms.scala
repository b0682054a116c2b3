package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary (Misra/Gries '82; mergeable form per
  * Agarwal et al., "Mergeable Summaries", PODS'12): at most `capacity`
  * (term → counter) entries; a miss on a full summary decrements every
  * counter (dropping zeros) instead of growing. Guarantees: estimated
  * count ∈ [true − N/(capacity+1), true], and any term with frequency
  * > N/(capacity+1) is present.
  *
  * This is the 100 TB shape for "top terms": ONE global aggregate whose
  * partials are bounded maps merged map-side — no shuffle keyed on the
  * term domain (`groupBy(term)` shuffles a row per distinct term per
  * partition; the summary shuffles ≤ capacity entries per partition,
  * whatever the vocabulary). When `capacity` ≥ the true distinct-term
  * count no decrement ever fires and the counts are EXACT — the fixture's
  * vocabulary is 31 terms vs the default capacity 256, which is what
  * makes q70 oracle-checkable against exact SQL counts.
  */
final class FreqBuffer(val capacity: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(term: String, by: Long = 1L): Unit = {
    counts.get(term) match {
      case Some(c) => counts.update(term, c + by)
      case None if counts.size < capacity => counts.update(term, by)
      case None => // decrement-all by min(by, smallest counter) batches
        val dec = math.min(by, counts.values.min)
        val dead = mutable.ArrayBuffer.empty[String]
        counts.keysIterator.foreach { k =>
          val c = counts(k) - dec
          if (c <= 0) dead += k else counts.update(k, c)
        }
        dead.foreach(counts.remove)
        if (by > dec) add(term, by - dec)
    }
  }

  /** Mergeable-summaries combine: add counters, then if over capacity
    * subtract the (capacity+1)-th largest value from all and drop ≤ 0.
    */
  def merge(other: FreqBuffer): Unit = {
    other.counts.foreach { case (t, c) =>
      counts.update(t, counts.getOrElse(t, 0L) + c)
    }
    if (counts.size > capacity) {
      val kth = counts.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.keysIterator.foreach { k =>
        val c = counts(k) - kth
        if (c <= 0) dead += k else counts.update(k, c)
      }
      dead.foreach(counts.remove)
    }
  }
}

/** `frequentTerms(term, capacity)` — aggregate to a map<string,long> of at
  * most `capacity` (term → estimated count) entries.
  */
case class FrequentTerms(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqBuffer] with UnaryLike[Expression] {

  require(capacity > 0, "capacity must be positive")

  override def prettyName: String = "frequent_terms"
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  // Once capacity < distinct terms, the decrement path makes the estimate
  // depend on shuffle-fetch/merge order, so a task retry can legitimately
  // produce different estimated counts. Declaring that keeps Spark from
  // assuming re-execution reproduces the value. (Exact — and therefore
  // stable — when capacity ≥ vocabulary, as in q70.)
  override lazy val deterministic: Boolean = false

  override def createAggregationBuffer(): FreqBuffer = new FreqBuffer(capacity)

  override def update(buffer: FreqBuffer, input: InternalRow): FreqBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: FreqBuffer, other: FreqBuffer): FreqBuffer = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: FreqBuffer): Any = {
    // deterministic map order: by term (map equality ignores order, but a
    // stable layout keeps serialized plans/results reproducible)
    val entries = buffer.counts.toArray.sortBy(_._1)
    ArrayBasedMapData(
      entries.map(e => UTF8String.fromString(e._1)).toArray[Any],
      entries.map(_._2).toArray[Any])
  }

  override def serialize(buffer: FreqBuffer): Array[Byte] = {
    val terms = buffer.counts.toArray
    val bytes = terms.map { case (t, _) => t.getBytes(UTF_8) }
    val bb = ByteBuffer.allocate(
      8 + bytes.map(_.length + 12).sum)
    bb.putInt(buffer.capacity).putInt(terms.length)
    terms.zip(bytes).foreach { case ((_, c), b) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new FreqBuffer(bb.getInt())
    val n = bb.getInt()
    (0 until n).foreach { _ =>
      val len = bb.getInt()
      val b = new Array[Byte](len); bb.get(b)
      buf.counts.update(new String(b, UTF_8), bb.getLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentTerms =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentTerms =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FrequentTerms =
    copy(child = newChild)
}

object FrequentTerms {
  def frequentTerms(term: Column, capacity: Int): Column =
    GraftSqlBridge.column(
      FrequentTerms(
        GraftSqlBridge.expression(term), capacity).toAggregateExpression())
}
