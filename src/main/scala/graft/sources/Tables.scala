package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")

  /** events + `ts_us`, the µs-precision long timestamp every consumer
    * compares on: `ts` is parquet TIMESTAMP(NANOS), read as a nanosecond
    * long under spark.sql.legacy.parquet.nanosAsLong (set by
    * Verify/Bench/tests), and `ts div 1000` ≡ DuckDB `epoch_us(ts)`.
    * ONE definition — the unit convention must not fork per consumer.
    */
  def eventsUs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    events(s, d).withColumn("ts_us", expr("ts div 1000"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
