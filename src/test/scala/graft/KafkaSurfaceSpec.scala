package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.JsonStreamSource

/** The Kafka production binding of [[JsonStreamSource]], exercised with
  * no network and no connector jar: the option map is asserted against
  * the real Kafka source option names, the starting-position enum
  * follows the reference's vocabulary, the reader BUILDS without a
  * connector (format/options are lazy — only load() needs the jar), and
  * decodeKafkaJson turns a Kafka-shaped frame into exactly the
  * (fields…, shard, transport_seq) contract the file transport emits, so
  * every downstream precombine works unchanged on either transport.
  */
class KafkaSurfaceSpec extends SparkTestBase {

  test("option map uses the real Kafka source names; positions follow the reference enum") {
    val opts = JsonStreamSource.kafkaOptions(
      "broker1:9092,broker2:9092", "events", "trim_horizon", Some(10000L))
    assert(opts == Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "events",
      "startingOffsets" -> "earliest",
      "maxOffsetsPerTrigger" -> "10000"))
    assert(JsonStreamSource.kafkaOptions("b", "t", "latest")("startingOffsets")
      == "latest")
    assert(JsonStreamSource.kafkaOptions("b", "t", "earliest")("startingOffsets")
      == "earliest")
    assert(!JsonStreamSource.kafkaOptions("b", "t", "latest")
      .contains("maxOffsetsPerTrigger"), "unbounded unless asked")
    val e = intercept[IllegalArgumentException] {
      JsonStreamSource.kafkaOptions("b", "t", "yesterday")
    }
    assert(e.getMessage.contains("startingPosition"))
  }

  test("the reader builds without a connector on the classpath") {
    // format()/option() are lazy; only load() resolves the source. The
    // wiring must therefore be constructible (and thus type-checked
    // against DataStreamReader) in this no-connector sandbox.
    val r = JsonStreamSource.kafkaReader(
      spark, "broker:9092", "events", "trim_horizon", Some(500L))
    assert(r.isInstanceOf[org.apache.spark.sql.streaming.DataStreamReader])
  }

  test("decodeKafkaJson emits the file transport's exact record contract") {
    // A frame shaped like the Kafka source's output (key/value binary,
    // topic, partition, offset, timestamp) built from literals.
    val kafkaSchema = StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType),
      StructField("topic", StringType),
      StructField("partition", IntegerType),
      StructField("offset", LongType),
      StructField("timestamp", TimestampType)))
    def rec(part: Int, off: Long, json: String) = Row(
      null, json.getBytes("UTF-8"), "events", part, off,
      java.sql.Timestamp.valueOf("2026-08-14 00:00:00"))
    import scala.jdk.CollectionConverters._
    val kafka = spark.createDataFrame(Seq(
      rec(0, 7L, """{"user_id":1,"v":10}"""),
      rec(0, 8L, """{"user_id":1,"v":11}"""),
      rec(1, 2L, """{"user_id":2,"v":20}"""),
      rec(1, 3L, """{"user_id":2,"v":"oops"}""")).asJava, kafkaSchema)
    val payload = StructType(Seq(
      StructField("user_id", LongType), StructField("v", StringType)))
    val decoded = JsonStreamSource.decodeKafkaJson(kafka, payload)
    assert(decoded.columns.toSeq == Seq("user_id", "v", "shard", "transport_seq"))
    val rows = decoded.orderBy("shard", "transport_seq").collect()
    // shard = partition; transport_seq = zero-padded offset, a total
    // lexicographic order per shard (offset 8 > 7, 3 > 2).
    assert(rows.map(r => (r.getAs[String]("shard"), r.getAs[String]("v"))).toSeq
      == Seq(("0", "10"), ("0", "11"), ("1", "20"), ("1", "oops")))
    assert(rows.forall(_.getAs[String]("transport_seq").length == 20))
    // The choice-type policy composes: the string-read field resolves
    // with the same resolveChoice as the file transport.
    val resolved = JsonStreamSource.resolveChoice(decoded, "v", IntegerType)
    assert(resolved.filter(col("v").isNull).count() == 1)
    assert(resolved.agg(sum(col("v"))).collect()(0).getLong(0) == 41L)
  }
}
