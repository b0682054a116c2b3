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

  test("type drift: numeric widening within the safe lattice") {
    import graft.schema.SchemaEvolution.widenType
    assert(widenType(IntegerType, LongType) == LongType)
    assert(widenType(LongType, IntegerType) == LongType)
    assert(widenType(ByteType, ShortType) == ShortType)
    assert(widenType(IntegerType, DoubleType) == DoubleType)
    // long↔float would lose precision in either integral direction → double
    assert(widenType(LongType, FloatType) == DoubleType)
    assert(widenType(FloatType, DoubleType) == DoubleType)
    // non-numeric conflict falls back to the choice-type string path
    assert(widenType(StringType, LongType) == StringType)
    assert(widenType(BooleanType, DateType) == StringType)
    assert(widenType(StringType, StringType) == StringType)
  }

  test("type drift recurses into containers: leaves widen, shape survives") {
    import graft.schema.SchemaEvolution.widenType
    val a = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    val b = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    assert(widenType(a, b) ==
      StructType(Seq(StructField("a", LongType), StructField("b", StringType))))
    assert(widenType(ArrayType(IntegerType), ArrayType(DoubleType)) ==
      ArrayType(DoubleType))
    assert(widenType(
      MapType(StringType, IntegerType), MapType(StringType, LongType)) ==
      MapType(StringType, LongType))
    // nested two levels down
    assert(widenType(
      StructType(Seq(StructField("xs", ArrayType(IntegerType)))),
      StructType(Seq(StructField("xs", ArrayType(LongType))))) ==
      StructType(Seq(StructField("xs", ArrayType(LongType)))))
    // shape drift (field set / order mismatch) is a choice conflict → string
    val grown = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType),
      StructField("c", IntegerType)))
    assert(widenType(a, grown) == StringType)
    assert(widenType(a, ArrayType(IntegerType)) == StringType)
  }

  test("type drift: int batch aligns against a long table schema and back") {
    val longSchema = StructType(Seq(
      StructField("name", StringType), StructField("n", LongType)))
    val intBatch = df(
      StructType(Seq(StructField("name", StringType), StructField("n", IntegerType))),
      Row("a", 1), Row("b", 2))
    val out = SchemaEvolution.align(intBatch, longSchema)
    assert(out.schema("n").dataType == LongType)
    assert(out.count() == 2)
    // reverse drift: long batch vs int table schema widens, not throws
    val longBatch = df(longSchema.copy(), Row("c", 9L))
    val out2 = SchemaEvolution.align(
      longBatch,
      StructType(Seq(StructField("name", StringType), StructField("n", IntegerType))))
    assert(out2.schema("n").dataType == LongType)
    assert(out2.collect().map(_.getLong(1)).toSeq == Seq(9L))
  }

  test("type drift: incompatible conflict resolves via the string choice path") {
    val batch = df(
      StructType(Seq(StructField("v", LongType))), Row(5L))
    val out = SchemaEvolution.align(
      batch, StructType(Seq(StructField("v", StringType))))
    assert(out.schema("v").dataType == StringType)
    assert(out.collect().head.getString(0) == "5")
  }

  test("system columns are dropped from user views") {
    val batch = df(base, Row("a", "2024-03-07", "v1"))
      .withColumn("_graft_commit_time", org.apache.spark.sql.functions.lit("t0"))
    assert(SchemaEvolution.dropSystemColumns(batch).columns.toSet ==
      Set("name", "date", "payload"))
  }
}
