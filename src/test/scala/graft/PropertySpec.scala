package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test => ScTest}

import graft.schema.SchemaEvolution
import graft.table.{KeyedTable, KeyedTableSpec}

/** Property-based checks from SURVEY §5: upsert idempotence, precombine
  * commutativity across batch splits, and schema-union associativity —
  * scalacheck generators drawing keys from a small pool so collisions
  * (the interesting case) actually happen. Few iterations per property:
  * each run is a real Spark upsert.
  */
object PropertySpec extends Properties("graft") {

  override def overrideParameters(p: ScTest.Parameters): ScTest.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark = SparkTestBase.session

  private val schema = StructType(Seq(
    StructField("name", StringType),
    StructField("date", StringType),
    StructField("year", IntegerType),
    StructField("payload", StringType)))

  private val genRecord: Gen[Row] = for {
    name <- Gen.oneOf((1 to 8).map(i => s"key-$i"))
    y <- Gen.choose(2022, 2024)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
    payload <- Gen.identifier.map(_.take(12))
  } yield Row(name, f"$y-$m%02d-$d%02d", y, payload)

  private val genBatch: Gen[List[Row]] = Gen.listOfN(30, genRecord)

  private def df(rows: List[Row]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  private def freshTable() = KeyedTable(KeyedTableSpec(
    path = Files.createTempDirectory("graft_prop_").toString + "/t",
    keyCols = Seq("name"),
    precombineCol = "date",
    tiebreakCols = Seq("payload"),
    partitionCols = Seq("year")))

  private def snapshot(t: KeyedTable): Set[(String, String, Int, String)] =
    t.read(spark).collect()
      .map(r => (
        r.getAs[String]("name"), r.getAs[String]("date"),
        r.getAs[Int]("year"), r.getAs[String]("payload")))
      .toSet

  property("upsert is idempotent: upsert(upsert(t,b),b) == upsert(t,b)") =
    Prop.forAll(genBatch) { rows =>
      val t = freshTable()
      val b = df(rows)
      t.upsert(spark, b, commitTime = "c0")
      val once = snapshot(t)
      t.upsert(spark, b, commitTime = "c1")
      snapshot(t) == once
    }

  property("precombine commutes across batch splits: any split order converges") =
    Prop.forAll(genBatch, Gen.choose(0, 30)) { (rows, cut) =>
      val (b1, b2) = rows.splitAt(math.min(cut, rows.length))
      val whole = freshTable()
      whole.upsert(spark, df(rows), commitTime = "c0")

      val split = freshTable()
      if (b1.nonEmpty) split.upsert(spark, df(b1), commitTime = "c0")
      if (b2.nonEmpty) split.upsert(spark, df(b2), commitTime = "c1")

      val reversed = freshTable()
      if (b2.nonEmpty) reversed.upsert(spark, df(b2), commitTime = "c0")
      if (b1.nonEmpty) reversed.upsert(spark, df(b1), commitTime = "c1")

      snapshot(whole) == snapshot(split) && snapshot(split) == snapshot(reversed)
    }

  private val genFieldNames: Gen[List[String]] =
    Gen.someOf(List("a", "b", "c", "d", "e")).map(_.toList).suchThat(_.nonEmpty)

  property("schema union is associative and order-insensitive on names") =
    Prop.forAll(genFieldNames, genFieldNames, genFieldNames) { (fa, fb, fc) =>
      def schemaOf(names: List[String]) =
        StructType(names.map(StructField(_, StringType)))
      def emptyDf(names: List[String]) =
        SchemaEvolution.emptyOf(spark, schemaOf(names))
      val abThenC = SchemaEvolution.align(
        SchemaEvolution.align(emptyDf(fa), schemaOf(fb)), schemaOf(fc))
      val bcFromA = SchemaEvolution.align(
        emptyDf(fa), SchemaEvolution.align(emptyDf(fb), schemaOf(fc)).schema)
      abThenC.columns.toSet == (fa ++ fb ++ fc).toSet &&
        bcFromA.columns.toSet == (fa ++ fb ++ fc).toSet
    }

  private val genType: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BooleanType, DateType, TimestampType)

  property("widenType is symmetric, idempotent, and never narrows a numeric") =
    Prop.forAll(genType, genType) { (a, b) =>
      val w = SchemaEvolution.widenType(a, b)
      val numericRank = Map[DataType, Int](
        ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3,
        FloatType -> 4, DoubleType -> 5)
      val noNarrowing = (numericRank.get(a), numericRank.get(w)) match {
        case (Some(ra), Some(rw)) => rw >= ra
        case (Some(_), None)      => w == StringType // choice fallback
        case _                    => true
      }
      SchemaEvolution.widenType(b, a) == w &&
        SchemaEvolution.widenType(a, a) == a &&
        SchemaEvolution.widenType(w, w) == w &&
        noNarrowing
    }
}
