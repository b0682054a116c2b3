package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** The driver regenerated the shipped fixtures once mid-build (round 8):
  * `events.ts` went from parquet TIMESTAMP(NANOS) — read as a nanos long
  * under nanosAsLong — to TIMESTAMP(MICROS), read as TIMESTAMP_NTZ, and
  * 43 queries died at plan time. `Tables.events` now normalizes either
  * physical shape to the one epoch-nanos-long convention; this spec pins
  * that contract against BOTH shapes so the next regeneration fails one
  * focused test with a readable message, not a third of the suite.
  */
class FixtureDriftSpec extends SparkTestBase {
  import spark.implicits._

  private def writeBothShapes(): (String, String) = {
    val base = Files.createTempDirectory("graft_drift_").toString
    val rows = Seq(
      (1L, 1700000000123456L, 10L, "click", 1.0, "{}"),
      (2L, 1700000000123456L + 86400L * 1000000L, 11L, "view", 2.0, "{}"))
      .toDF("event_id", "ts_us_raw", "user_id", "event_type", "value", "props")
    // Shape A: ts as a plain INT64 of nanos (what nanosAsLong yields from
    // the TIMESTAMP(NANOS) tiers — physically indistinguishable on write).
    rows.select(col("event_id"), (col("ts_us_raw") * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$base/long/events.parquet")
    // Shape B: ts as TIMESTAMP_NTZ (what TIMESTAMP(MICROS) reads back as).
    rows.select(col("event_id"),
        expr("cast(timestamp_micros(ts_us_raw) as timestamp_ntz)").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$base/ntz/events.parquet")
    (s"$base/long", s"$base/ntz")
  }

  test("Tables.events normalizes both shipped ts physical shapes to the same nanos long") {
    val (longDir, ntzDir) = writeBothShapes()
    val a = Tables.events(spark, longDir)
    val b = Tables.events(spark, ntzDir)
    assert(a.schema("ts").dataType == LongType)
    assert(b.schema("ts").dataType == LongType)
    val av = a.select("event_id", "ts").as[(Long, Long)].collect().toMap
    val bv = b.select("event_id", "ts").as[(Long, Long)].collect().toMap
    assert(av == bv, s"nanos values must agree across shapes: $av vs $bv")
    assert(av(1L) == 1700000000123456L * 1000L)
  }

  test("all 10 fixture tables still load with the schemas the engine assumes") {
    // Spark-visible schema (post-Tables normalization for events) as of
    // the round-8 regeneration. A future regeneration that changes any
    // physical type fails HERE with a named diff — not as 40 opaque
    // plan-time errors spread over the query suite. Timestamp-typed
    // columns are asserted by NAME ONLY (NTZ vs LTZ and ms/us/ns all
    // loaded fine historically; it is LONG-vs-timestamp flips and
    // renamed/retyped value columns that break query code).
    val expected = Map(
      "region" -> "r_regionkey:int,r_name:string",
      "nation" -> "n_nationkey:int,n_name:string,n_regionkey:int",
      "customer" -> "c_custkey:bigint,c_name:string,c_nationkey:int,c_acctbal:double,c_mktsegment:string",
      "supplier" -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double",
      "part" -> "p_partkey:bigint,p_name:string,p_brand:string,p_type:string,p_size:int,p_retailprice:double",
      "orders" -> "o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double,o_orderdate:ts,o_orderpriority:string",
      "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_linenumber:int," +
        "l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double," +
        "l_returnflag:string,l_linestatus:string,l_shipdate:ts"),
      "events" -> "event_id:bigint,ts:bigint,user_id:bigint,event_type:string,value:double,props:string",
      "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
      "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int")
    val drifted = expected.flatMap { case (t, want) =>
      val df =
        if (t == "events") Tables.events(spark, sf0001)
        else Tables.load(spark, sf0001, t)
      val got = df.schema.fields.map { f =>
        val tn = f.dataType.catalogString match {
          case s if s.startsWith("timestamp") => "ts"
          case s => s
        }
        s"${f.name}:$tn"
      }.mkString(",")
      if (got == want) None else Some(s"$t:\n  want $want\n  got  $got")
    }
    assert(drifted.isEmpty,
      s"fixture schema drift detected — update Tables/queries knowingly:\n${drifted.mkString("\n")}")
  }

  test("the shipped fixture still loads under the nanos-long convention") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType == LongType,
      s"Tables.events must yield a nanos long; fixture drifted again? " +
        s"schema=${ev.schema.treeString}")
    // µs values must be sane epoch stamps (year ≳ 2000), i.e. the unit
    // convention did not silently shift by 1000×.
    val minUs = ev.agg(min(expr("ts div 1000"))).head.getLong(0)
    assert(minUs > 946684800000000L, s"ts div 1000 should be epoch µs, got $minUs")
  }
}
