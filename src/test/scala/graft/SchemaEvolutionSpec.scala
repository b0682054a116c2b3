package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.schema.SchemaEvolution

/** The reference's schema-evolution contract (SURVEY §5 scenarios 4–6):
  * new columns widen, missing columns null-fill, equal schemas pass
  * through, bootstrap passes through.
  */
class SchemaEvolutionSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(rows.asJava, schema)

  private val base = StructType(Seq(
    StructField("name", StringType),
    StructField("date", StringType),
    StructField("payload", StringType)))

  test("schema add: new incoming column widens the union schema") {
    val wide = StructType(base.fields :+ StructField("new_col", LongType))
    val batch = df(wide, Row("a", "2024-03-07", "v1", 1L))
    val out = SchemaEvolution.align(batch, base)
    assert(out.columns.toSet == Set("name", "date", "payload", "new_col"))
    assert(out.count() == 1)
  }

  test("schema miss: column known to the table but absent from batch is null-filled") {
    val narrow = StructType(base.fields.take(2))
    val batch = df(narrow, Row("a", "2024-03-07"))
    val out = SchemaEvolution.align(batch, base)
    assert(out.columns.toSet == Set("name", "date", "payload"))
    val row = out.collect().head
    assert(row.isNullAt(row.fieldIndex("payload")))
  }

  test("equal schemas pass through unchanged (the reference's NameError path, fixed)") {
    val batch = df(base, Row("a", "2024-03-07", "v1"))
    val out = SchemaEvolution.align(batch, base)
    assert(out.schema.fieldNames.sameElements(batch.schema.fieldNames))
    assert(out.count() == 1)
  }

  test("bootstrap: no current schema → batch passes through") {
    val batch = df(base, Row("a", "2024-03-07", "v1"))
    val out = SchemaEvolution.align(batch, None)
    assert(out eq batch)
  }

  test("differs ignores nullability but not order or type") {
    val a = StructType(Seq(StructField("x", LongType, nullable = true)))
    val b = StructType(Seq(StructField("x", LongType, nullable = false)))
    assert(!SchemaEvolution.differs(a, b))
    val c = StructType(Seq(StructField("x", StringType)))
    assert(SchemaEvolution.differs(a, c))
  }

  test("system columns are dropped from user views") {
    val batch = df(base, Row("a", "2024-03-07", "v1"))
      .withColumn("_graft_commit_time", org.apache.spark.sql.functions.lit("t0"))
    assert(SchemaEvolution.dropSystemColumns(batch).columns.toSet ==
      Set("name", "date", "payload"))
  }
}
