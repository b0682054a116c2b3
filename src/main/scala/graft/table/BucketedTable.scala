package graft.table

import org.apache.spark.sql.DataFrame

/** Bucketed table writes — the co-located-join lever for repeated big⋈big
  * joins (SURVEY §7 / builder brief: "bucketing for co-located joins").
  *
  * A shuffle join at 100 TB moves both sides over the network every time
  * the join runs. Writing each side `bucketBy(n, key)` pre-hash-partitions
  * the data ON DISK into `n` files per partition by the same hash Spark's
  * shuffle would use, and `sortBy` orders rows within each bucket — so a
  * sort-merge join between two tables bucketed on the join key with the
  * same bucket count reads matching buckets pairwise with NO exchange (and
  * no per-query sort when each bucket holds one file): the shuffle is paid
  * once at write time and amortized over every subsequent join, the same
  * trade the write-time sketch/cid index in [[SketchedTable]] makes for
  * ANN probes. The bucket metadata lives in the session catalog
  * (`saveAsTable`), which is what lets the planner prove co-location.
  *
  * The spec asserts the plan property directly: joining two bucketed
  * tables on the bucket key produces an executed plan with zero
  * `Exchange` nodes.
  */
object BucketedTable {

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet table. */
  def write(
      df: DataFrame,
      table: String,
      buckets: Int,
      key: String,
      sortCols: Seq[String] = Nil): Unit = {
    val sorts = if (sortCols.isEmpty) Seq(key) else sortCols
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }
}
