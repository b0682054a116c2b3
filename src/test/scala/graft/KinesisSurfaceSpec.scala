package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.JsonStreamSource

/** The Kinesis production binding of [[JsonStreamSource]] — the
  * reference's ACTUAL transport (...Template.yaml:56-104) — exercised
  * with no network and no connector jar: the option map is asserted
  * against the awslabs spark-sql-kinesis-connector option names, the
  * starting-position enum follows the reference's vocabulary
  * (glue_job_script.py:32-33), the reader BUILDS without a connector
  * (format/options are lazy — only load() needs the jar), and
  * decodeKinesisJson turns a Kinesis-shaped frame into exactly the
  * (fields…, shard, transport_seq) contract the file and Kafka
  * transports emit, so every downstream precombine works unchanged on
  * any of the three.
  */
class KinesisSurfaceSpec extends SparkTestBase {

  test("option map uses the connector's names; positions follow the reference enum") {
    val opts = JsonStreamSource.kinesisOptions(
      "events-stream", "us-east-1", "trim_horizon", Some(10000L))
    assert(opts == Map(
      "kinesis.streamName" -> "events-stream",
      "kinesis.region" -> "us-east-1",
      "kinesis.endpointUrl" -> "https://kinesis.us-east-1.amazonaws.com",
      "kinesis.startingposition" -> "TRIM_HORIZON",
      "kinesis.maxFetchRecordsPerShard" -> "10000"))
    assert(JsonStreamSource.kinesisOptions("s", "r", "latest")("kinesis.startingposition")
      == "LATEST")
    // Kinesis's oldest retained point IS trim_horizon — the reference's
    // `earliest` maps there, exactly as the Kafka half maps it to
    // `earliest` offsets.
    assert(JsonStreamSource.kinesisOptions("s", "r", "earliest")("kinesis.startingposition")
      == "TRIM_HORIZON")
    assert(!JsonStreamSource.kinesisOptions("s", "r", "latest")
      .contains("kinesis.maxFetchRecordsPerShard"), "unbounded unless asked")
    val e = intercept[IllegalArgumentException] {
      JsonStreamSource.kinesisOptions("s", "r", "yesterday")
    }
    assert(e.getMessage.contains("startingPosition"))
  }

  test("the reader builds without a connector on the classpath") {
    val r = JsonStreamSource.kinesisReader(
      spark, "events-stream", "eu-west-1", "trim_horizon", Some(500L))
    assert(r.isInstanceOf[org.apache.spark.sql.streaming.DataStreamReader])
  }

  test("decodeKinesisJson emits the shared record contract; seq order survives padding") {
    // A frame shaped like the connector's output (data binary plus
    // stream/shard/sequence metadata) built from literals. The two
    // sequence numbers on shard 0 differ in LENGTH ("99" < "100"
    // numerically ordered, wrongly ordered as raw strings) — the exact
    // hazard the zero-padding exists for.
    val kinesisSchema = StructType(Seq(
      StructField("data", BinaryType),
      StructField("streamName", StringType),
      StructField("partitionKey", StringType),
      StructField("sequenceNumber", StringType),
      StructField("approximateArrivalTimestamp", TimestampType),
      StructField("shardId", StringType)))
    def rec(shard: String, seq: String, json: String) = Row(
      json.getBytes("UTF-8"), "events-stream", "pk", seq,
      java.sql.Timestamp.valueOf("2026-08-14 00:00:00"), shard)
    import scala.jdk.CollectionConverters._
    val kinesis = spark.createDataFrame(Seq(
      rec("shardId-000000000000", "99", """{"user_id":1,"v":10}"""),
      rec("shardId-000000000000", "100", """{"user_id":1,"v":11}"""),
      rec("shardId-000000000001", "7", """{"user_id":2,"v":20}"""),
      rec("shardId-000000000001", "8", """{"user_id":2,"v":"oops"}"""))
      .asJava, kinesisSchema)
    val payload = StructType(Seq(
      StructField("user_id", LongType), StructField("v", StringType)))
    val decoded = JsonStreamSource.decodeKinesisJson(kinesis, payload)
    assert(decoded.columns.toSeq == Seq("user_id", "v", "shard", "transport_seq"))
    val rows = decoded.orderBy("shard", "transport_seq").collect()
    // shard = shardId; transport_seq = zero-padded sequence number — the
    // padding restores numeric order under string sort (99 before 100).
    assert(rows.map(r => (r.getAs[String]("shard"), r.getAs[String]("v"))).toSeq
      == Seq(
        ("shardId-000000000000", "10"), ("shardId-000000000000", "11"),
        ("shardId-000000000001", "20"), ("shardId-000000000001", "oops")))
    assert(rows.forall(_.getAs[String]("transport_seq").length == 56))
    // The choice-type policy composes: the string-read field resolves
    // with the same resolveChoice as the file and Kafka transports.
    val resolved = JsonStreamSource.resolveChoice(decoded, "v", IntegerType)
    assert(resolved.filter(col("v").isNull).count() == 1)
    assert(resolved.agg(sum(col("v"))).collect()(0).getLong(0) == 41L)
  }
}
