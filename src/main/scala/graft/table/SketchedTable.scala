package graft.table

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity
import graft.sources.Tables

/** Write-time ANN index for the embeddings table: the hyperplane sketch
  * and the IVF cell id are computed ONCE when the table is written — not
  * per query — and the layout is hive-partitioned by `cid`, so an IVF
  * probe becomes a partition-pruned file scan (`PartitionFilters: cid IN
  * (…)` in the physical plan, only `nprobe/nlist` of the files read) and
  * an LSH query reads the precomputed sketch column instead of running
  * the dot products against every hyperplane again.
  *
  * This is the "computable at write time" design the ANN operators'
  * scaladoc promises: at 100 TB the index is written by the ingest
  * pipeline (a `KeyedTable`-style managed write; `nlist` sized so each
  * cell is a few files), queries prune to their probe cells, and the
  * centroid matrix — nlist×dim floats, kilobytes — travels beside the
  * data. Here the index is built lazily per (session JVM, source dir)
  * into a scratch path, which keeps the driver contract (queries take
  * the raw fixture dir) while the scan-side plans are the indexed ones.
  */
object SketchedTable {
  val Bits = 48
  val Dim = 64
  val NList = 16
  val Iters = 2
  val PqM = 8
  val PqK = 64

  /** The materialized index: layout path, IVF centroid matrix, PQ
    * codebooks — everything a query needs beside the files.
    */
  final case class AnnIndex(
      path: String,
      centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]])

  // (source dir) -> index; per-JVM so every fresh run rebuilds from the
  // current fixture files (no cross-run staleness).
  private val built = TrieMap.empty[String, AnnIndex]

  private def indexPath(dir: String): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft_ann_index/$key"
  }

  /** Build (once per JVM per source dir) and return the indexed layout:
    * parquet partitioned by `cid` with materialized `sketch` (hyperplane
    * LSH) and `pq` (packed product-quantization code) columns, plus the
    * IVF centroid matrix and PQ codebooks.
    */
  def ensure(s: SparkSession, dir: String): AnnIndex =
    built.getOrElseUpdate(dir, {
      val e = Tables.embeddings(s, dir)
        .repartition(s.sparkContext.defaultParallelism)
      val centroids = Similarity.ivfCentroids(e, NList, Iters)
      val codebooks = Similarity.pqTrain(e, PqM, PqK, Dim)
      val path = indexPath(dir)
      Similarity.withCentroidId(
          e.withColumn("sketch",
            VectorFunctions.hyperplaneSketch(col("embedding"), Bits, Dim))
           .withColumn("pq", Similarity.pqCodeExpr(col("embedding"), codebooks)),
          centroids)
        .write.mode("overwrite").partitionBy("cid").parquet(path)
      AnnIndex(path, centroids, codebooks)
    })

  private def readIndex(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** [[Similarity.annLsh]] over the materialized sketch column: the
    * 48-plane projection is not recomputed per query; the scan reads
    * (vec_id, label, sketch, embedding) and the Hamming filter runs on
    * the stored long.
    */
  def annLshIndexed(
      s: SparkSession,
      dir: String,
      queryId: Long = 0L,
      k: Int = 10,
      maxHamming: Int = 26): DataFrame = {
    val e = readIndex(s, ensure(s, dir).path)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), col("sketch").as("q_sketch"))
    e.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .filter(VectorFunctions.hamming(col("sketch"), col("q_sketch")) <= maxHamming)
      .withColumn("cos", VectorFunctions.cosineSim(col("embedding"), col("q_emb")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"))
  }

  /** [[Similarity.annIvf]] over the partitioned layout: the probe is a
    * `cid IN (…)` partition filter, so only the probed cells' files are
    * read — the physical plan's PartitionFilters line is the evidence.
    * Same calibrated `nprobe` as the unindexed path, so the output equals
    * the brute-force top-k.
    */
  def annIvfIndexed(
      s: SparkSession,
      dir: String,
      queryId: Long = 0L,
      k: Int = 10,
      nprobe: Int = 8): DataFrame = {
    val idx = ensure(s, dir)
    val centroids = idx.centroids
    val e = readIndex(s, idx.path)
    val qVec = e.filter(col("vec_id") === queryId)
      .select("embedding").collect().head.getSeq[Float](0).toArray
    def cosTo(c: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < math.min(c.length, qVec.length)) {
        dot += c(i).toDouble * qVec(i); nx += c(i).toDouble * c(i)
        ny += qVec(i).toDouble * qVec(i); i += 1
      }
      val d = math.sqrt(nx) * math.sqrt(ny); if (d == 0) 0 else dot / d
    }
    val probeCids = centroids.zipWithIndex
      .sortBy { case (c, i) => (-cosTo(c), i) }
      .take(nprobe).map(_._2)

    val q = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    e.filter(
        col("cid").isin(probeCids.map(Integer.valueOf).toIndexedSeq: _*) &&
        col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", VectorFunctions.cosineSim(col("embedding"), col("q_emb")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"))
  }

  /** PQ-pruned ANN — the third sketch path beside the Hamming filter and
    * the IVF partition prune: candidates are scored with the asymmetric-
    * distance table over the stored packed `pq` code (m table lookups +
    * adds per row — no per-candidate float-vector math, and at scale the
    * scan reads 8 bytes per vector instead of the embedding), the best
    * `rerank` survivors get the exact fused cosine, and the final top-k
    * equals [[Similarity.annBrute]]'s. `rerank` defaults to 300: the
    * fixture's true top-10 sits within ADC rank ≤ 197 at sf0.01 / ≤ 76 at
    * sf0.001 (measured by `graft.Calibrate`) — near-random fixture
    * geometry (neighbors at cosine ≈0.3); real corpora with near-dup
    * structure prune orders of magnitude harder at the same budget.
    */
  def annPqIndexed(
      s: SparkSession,
      dir: String,
      queryId: Long = 0L,
      k: Int = 10,
      rerank: Int = 300): DataFrame = {
    val idx = ensure(s, dir)
    val e = readIndex(s, idx.path)
    val qVec = Similarity.normalized(
      e.filter(col("vec_id") === queryId)
        .select("embedding").collect().head.getSeq[Float](0).toArray)
    val tables = Similarity.pqAdcTables(qVec, idx.codebooks)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    e.filter(col("vec_id") =!= queryId)
      .withColumn("adc", Similarity.pqAdcExpr(col("pq"), tables))
      .orderBy(col("adc"), col("vec_id")) // deterministic at the margin
      .limit(rerank)
      .crossJoin(broadcast(q))
      .withColumn("cos", VectorFunctions.cosineSim(col("embedding"), col("q_emb")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"))
  }
}
