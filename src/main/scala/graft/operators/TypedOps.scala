package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col

import graft.sources.Tables

/** Typed Dataset surface (SURVEY §1.4: `Dataset[T]` where a fixed
  * case-class contract exists): events as a case class, aggregated through
  * a custom typed `Aggregator` — compile-time field checks, partial
  * aggregation (zero/reduce/merge), Catalyst encoders end to end.
  */
object TypedOps {

  /** events row contract; `ts` is the nanos long (see Verify's
    * nanosAsLong note).
    */
  final case class Event(
      event_id: Long,
      ts: Long,
      user_id: Long,
      event_type: String,
      value: Double,
      props: String)

  /** Typed count+max aggregator: associative/commutative, so Spark runs it
    * with map-side partial aggregation like any declarative aggregate.
    */
  object EventStats extends Aggregator[Event, (Long, Double), (Long, Double)] {
    override def zero: (Long, Double) = (0L, Double.NegativeInfinity)
    override def reduce(b: (Long, Double), e: Event): (Long, Double) =
      (b._1 + 1, math.max(b._2, e.value))
    override def merge(a: (Long, Double), b: (Long, Double)): (Long, Double) =
      (a._1 + b._1, math.max(a._2, b._2))
    override def finish(b: (Long, Double)): (Long, Double) = b
    override def bufferEncoder: Encoder[(Long, Double)] = Encoders.product
    override def outputEncoder: Encoder[(Long, Double)] = Encoders.product
  }

  /** Per-user event count + max value through the typed path. */
  def typedAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir).as[Event]
      .groupByKey(_.user_id)
      .agg(EventStats.toColumn.name("stats"))
      .select(
        col("key").as("user_id"),
        col("stats._1").as("n_events"),
        col("stats._2").as("max_value"))
  }
}
