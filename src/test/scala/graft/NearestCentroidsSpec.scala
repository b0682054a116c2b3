package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** [[graft.functions.NearestCentroids]] must be bit-for-bit the composed
  * shape it replaced (`least`/`array_sort` over one fused cosine per
  * centroid) — same double arithmetic, same (dist asc, cid asc) ties —
  * or every IVF consumer (q34/q40/q44/q98/q41/q67 index build) silently
  * drifts from its calibration. The composed form is reconstructed here
  * as the oracle.
  */
class NearestCentroidsSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 16
  private def vec(seed: Long): Seq[Float] = {
    var x = seed
    Seq.tabulate(dim) { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 40).toInt % 1000) / 500.0f - 1.0f
    }
  }

  // Duplicated centroid (0 and 4 identical) forces exact distance ties;
  // the zero centroid exercises the 0-denominator branch.
  private val cents: Array[Array[Float]] = Array(
    vec(1).toArray, vec(2).toArray, vec(3).toArray,
    Array.fill(dim)(0.0f), vec(1).toArray)

  private def composed(emb: org.apache.spark.sql.Column, k: Int) = {
    val ranked = cents.zipWithIndex.toIndexedSeq.map { case (c, i) =>
      struct(
        (lit(1.0) - VectorFunctions.cosineSim(emb, typedlit(c.toSeq))).as("dist"),
        lit(i).as("cid"))
    }
    transform(slice(array_sort(array(ranked: _*)), 1, k), s => s.getField("cid"))
  }

  test("kernel output equals the composed least/array_sort form, ties and all") {
    val rows = (0 until 500).map(i => Tuple1(vec(100 + i))) :+
      Tuple1(Seq.empty[Float]) :+ Tuple1(Seq.fill(dim)(0.0f))
    val df = rows.toDF("embedding")
    for (k <- Seq(1, 3, cents.length)) {
      val both = df.select(
        VectorFunctions.nearestCentroids(col("embedding"), cents, k).as("kern"),
        composed(col("embedding"), k).as("comp"))
      val bad = both.filter(col("kern") =!= col("comp"))
      assert(bad.isEmpty,
        s"k=$k mismatch: ${bad.take(3).mkString("; ")}")
    }
  }

  test("null embedding yields null (nullIntolerant edge made explicit)") {
    val df = Seq(Tuple1(Option.empty[Seq[Float]])).toDF("embedding")
    val out = df.select(
      VectorFunctions.nearestCentroids(col("embedding"), cents, 2).as("nc"))
    assert(out.head.isNullAt(0))
  }
}
