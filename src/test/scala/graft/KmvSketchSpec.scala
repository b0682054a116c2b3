package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvDistinct.kmvDistinct
import graft.sources.Tables

/** The KMV distinct-count sketch: exact below capacity under any
  * partitioning (the merge path), the documented ~1/√k estimator beyond
  * capacity, and buffer-level merge/serialize round-trips.
  */
class KmvSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("exact mode equals COUNT(DISTINCT) regardless of partitioning") {
    val e = Tables.events(spark, sf0001)
    for (parts <- Seq(1, 7, 32)) {
      val got = e.repartition(parts)
        .groupBy("event_type")
        .agg(kmvDistinct(xxhash64(col("user_id")), 1 << 16).as("n"))
        .as[(String, Long)].collect().toMap
      val want = e.groupBy("event_type")
        .agg(countDistinct("user_id").as("n"))
        .as[(String, Long)].collect().toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("estimator beyond capacity lands within the ~1/sqrt(k) band") {
    // 2000 distinct ids through a k=256 sketch: RSE ≈ 6.3%; assert a
    // generous 4σ band so the test pins the estimator, not the seed.
    val got = spark.range(0, 2000)
      .agg(kmvDistinct(xxhash64(col("id")), 256).as("n"))
      .as[Long].head()
    assert(math.abs(got - 2000.0) / 2000.0 < 0.25, s"estimate $got")
  }

  test("buffer add/merge keeps the k smallest distinct, unsigned order") {
    val a = new graft.functions.KmvBuffer(4)
    Seq(5L, -1L, 5L, 7L, 2L, 9L, 3L).foreach(a.add) // -1 is unsigned-max
    // k smallest unsigned: 2, 3, 5, 7
    assert(a.size == 4 && a.hashes.take(4).toSeq == Seq(2L, 3L, 5L, 7L))
    val b = new graft.functions.KmvBuffer(4)
    Seq(1L, 2L, 8L).foreach(b.add)
    assert(b.estimate == 3L) // below capacity: exact
    a.merge(b)
    assert(a.hashes.take(4).toSeq == Seq(1L, 2L, 3L, 5L))
    assert(a.estimate > 0L) // at capacity: estimator territory
  }
}
