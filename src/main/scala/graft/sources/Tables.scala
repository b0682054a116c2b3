package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Fixture-table loaders (TESTDATA.md): one parquet file per table under a
  * scale-factor directory. Column pruning and predicate pushdown reach the
  * parquet scan because these are plain `spark.read.parquet` relations.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events with `ts` NORMALIZED to an epoch-NANOS long, whatever the
    * parquet physical type is. The fixture has shipped `ts` two ways
    * across regenerations — TIMESTAMP(NANOS) (read as a nanos long under
    * spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS) (read as
    * TIMESTAMP_NTZ) — so the one loader adapts and every consumer keeps
    * the single convention: `ts` is nanos, `ts div 1000` is µs and
    * ≡ DuckDB `epoch_us(ts)` (the oracle side reads the raw parquet and
    * `epoch_us` binds against either annotation). The NTZ branch casts
    * through TIMESTAMP_LTZ under the session's UTC zone (Sessions.scala),
    * which makes the wall-clock value the epoch value — same µs DuckDB
    * sees. ONE definition — the unit convention must not fork per
    * consumer.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw // legacy TIMESTAMP(NANOS) tier, already nanos
      case _ => raw.withColumn(
        "ts", expr("unix_micros(cast(ts as timestamp_ltz)) * 1000L"))
    }
  }

  /** events + `ts_us`, the µs-precision long every oracle compares on. */
  def eventsUs(s: SparkSession, d: String): DataFrame =
    events(s, d).withColumn("ts_us", expr("ts div 1000"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
