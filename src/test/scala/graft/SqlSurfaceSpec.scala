package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The SQL surface: custom Catalyst expressions callable from spark.sql
  * after registration, and the SparkSessionExtensions wiring instantiates
  * cleanly (the `spark.sql.extensions=graft.GraftExtensions` deploy path).
  */
class SqlSurfaceSpec extends SparkTestBase {

  test("registered SQL functions evaluate through spark.sql") {
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    val row = spark.sql(
      """SELECT
        |  cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos_same,
        |  dot_product(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS dot,
        |  hamming64(255L, 15L) AS ham,
        |  rolling_hash('abc') AS rh,
        |  sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS ic
        |""".stripMargin)
      .as[(Double, Double, Int, Long, Int)].head()
    assert(row._1 == 1.0)
    assert(row._2 == 6.0)
    assert(row._3 == 4)
    // h("abc") = ((0*31+97)*31+98)*31+99
    assert(row._4 == ((97L * 31 + 98) * 31 + 99))
    assert(row._5 == 2)
  }

  test("minhash_signature via SQL returns the configured signature length") {
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    val sig = spark.sql("SELECT minhash_signature(array('x y z', 'y z w'), 16) AS s")
      .as[Seq[Long]].head()
    assert(sig.length == 16)
  }

  test("GraftExtensions applies to a fresh SparkSessionExtensions without error") {
    val exts = new SparkSessionExtensions
    new GraftExtensions().apply(exts)
  }
}
