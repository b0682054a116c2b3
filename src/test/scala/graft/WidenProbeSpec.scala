package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pins the Spark parquet-reader behavior `KeyedTable.parquetWidenReadable`
  * depends on: type promotion happens per parquet LEAF column, so files
  * written with a narrower leaf inside a struct/array remain readable under
  * the recursively-widened schema — which is what lets a nested type-drift
  * commit skip the full-table rewrite.
  */
class WidenProbeSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  test("nested struct leaf int32 widen-reads as long") {
    val dir = java.nio.file.Files.createTempDirectory("wp_").toString
    val sch = StructType(Seq(StructField("s", StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))))
    spark.createDataFrame(Seq(Row(Row(7, "x"))).asJava, sch)
      .write.mode("overwrite").parquet(s"$dir/p")
    val wide = StructType(Seq(StructField("s", StructType(Seq(
      StructField("a", LongType), StructField("b", StringType))))))
    val r = spark.read.schema(wide).parquet(s"$dir/p").collect()
    assert(r.head.getStruct(0).getLong(0) == 7L)
  }

  test("array element int32 widen-reads as long") {
    val dir = java.nio.file.Files.createTempDirectory("wp_").toString
    val sch = StructType(Seq(StructField("arr", ArrayType(IntegerType))))
    spark.createDataFrame(Seq(Row(Seq(1, 2, 3))).asJava, sch)
      .write.mode("overwrite").parquet(s"$dir/p")
    val wide = StructType(Seq(StructField("arr", ArrayType(LongType))))
    val r = spark.read.schema(wide).parquet(s"$dir/p").collect()
    assert(r.head.getSeq[Long](0) == Seq(1L, 2L, 3L))
  }

  test("map value int32 widen-reads as long") {
    val dir = java.nio.file.Files.createTempDirectory("wp_").toString
    val sch = StructType(Seq(StructField("m", MapType(StringType, IntegerType))))
    spark.createDataFrame(Seq(Row(Map("a" -> 1, "b" -> 2))).asJava, sch)
      .write.mode("overwrite").parquet(s"$dir/p")
    val wide = StructType(Seq(StructField("m", MapType(StringType, LongType))))
    val r = spark.read.schema(wide).parquet(s"$dir/p").collect()
    assert(r.head.getMap[String, Long](0) == Map("a" -> 1L, "b" -> 2L))
  }
}
