package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** Column-level vector ops over `ArrayType(FloatType)` embedding columns
  * (FIXTURES.md: `embeddings.embedding`, dim=64).
  *
  * Two tiers, per the build plan (SURVEY §7.5):
  *   - `*Hof` variants compose built-in higher-order functions
  *     (`zip_with` + `aggregate`) — declarative, Catalyst-visible, the
  *     correctness baseline;
  *   - the default variants wrap the custom Catalyst expressions in
  *     [[CosineSimilarity]] / [[DotProduct]] — a single fused primitive
  *     loop with `doGenCode`, staying inside whole-stage codegen. At 100 TB
  *     (billions of pair evaluations in an ANN sweep) the fused loop avoids
  *     per-element boxing and two array materializations per pair.
  */
object VectorFunctions {

  /** Fused cosine similarity (custom codegen'd Catalyst expression). */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSimilarity(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Fused dot product (custom codegen'd Catalyst expression). */
  def dotProduct(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** The k nearest centroid ids of `v` by (cosine distance asc, cid asc)
    * — the IVF assign/probe kernel ([[NearestCentroids]]: constant-size
    * generated code for any nlist, where the unrolled per-centroid
    * composition blew Janino's 64 KB method limit at nlist=64).
    */
  def nearestCentroids(v: Column, cents: Array[Array[Float]], k: Int): Column =
    GraftSqlBridge.column(
      NearestCentroids(GraftSqlBridge.expression(v), cents, k))

  /** Packed PQ code of `v` against per-subspace codebooks ([[PqCode]] —
    * constant-size generated code for any m × ksub).
    */
  def pqCode(v: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftSqlBridge.column(PqCode(GraftSqlBridge.expression(v), codebooks))

  /** Built-in-only dot product: left-to-right fold in index order (so the
    * accumulation order — hence the exact double — is deterministic).
    */
  def dotProductHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Built-in-only cosine similarity. */
  def cosineSimHof(a: Column, b: Column): Column = {
    val dot = dotProductHof(a, b)
    val na = sqrt(dotProductHof(a, a))
    val nb = sqrt(dotProductHof(b, b))
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot / (na * nb))
  }

  def l2Norm(a: Column): Column = sqrt(dotProductHof(a, a))

  /** Sign-bit sketch for random-hyperplane LSH: bit i = sign(v · r_i) for
    * `bits` fixed pseudo-random hyperplanes (Charikar STOC'02). Vectors in
    * the same bucket are cosine-close with high probability; used to make
    * ANN join-shaped instead of all-pairs (SURVEY §7.4 scale path).
    * Hyperplane components are deterministic pseudo-randoms from splitmix64.
    */
  def hyperplaneSketch(v: Column, bits: Int, dim: Int): Column =
    GraftSqlBridge.column(
      HyperplaneSketch(
        GraftSqlBridge.expression(v), RandomPlanes.planes(bits, dim)))

  def hamming(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      HammingDistance64(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

}

/** Deterministic pseudo-random hyperplanes (splitmix64 stream, fixed seed)
  * shared by sketch computation across executors — no broadcast needed,
  * each task recomputes the same planes.
  */
object RandomPlanes {
  def planes(bits: Int, dim: Int): Array[Array[Float]] = {
    var s = 0x51_7c_c1_b7_27_22_0a_95L
    def next(): Long = {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.fill(bits, dim) {
      // uniform in [-1, 1) is fine for sign tests (need not be gaussian)
      (next().toDouble / Long.MaxValue.toDouble).toFloat
    }
  }
}
