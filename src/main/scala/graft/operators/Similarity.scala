package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the embeddings fixture
  * (`ArrayType(FloatType)`, dim 64 — FIXTURES.md). Two tiers per the build
  * plan (SURVEY §7.4): brute-force cosine top-k as the exactness baseline,
  * and a random-hyperplane-LSH bucketed variant as the scale path (prunes
  * the candidate set before the exact rerank, so the expensive cosine runs
  * on a small fraction of rows).
  */
object Similarity {

  /** Exact top-k cosine neighbors of `queryId`'s vector: one broadcast of
    * the single query row, a codegen'd fused cosine per candidate, then
    * TakeOrderedAndProject (per-partition top-k + driver merge — no global
    * sort). At 100 TB this is one full scan; `annLsh` is the path that
    * avoids the scan.
    */
  def annBrute(s: SparkSession, dir: String, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    e.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", VectorFunctions.cosineSim(col("embedding"), col("q_emb")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"))
  }

  /** LSH-bucketed ANN: 48-bit random-hyperplane sketch per vector; the
    * query probes only vectors whose sketch is within `maxHamming` bits of
    * its own (cheap integer filter), then exact-cosine reranks that
    * candidate pool. Defaults calibrated to the synthetic fixture (top
    * neighbors at cosine ≈0.3, i.e. ~72° — hence the wide Hamming budget;
    * 48/20 prunes ~85% of candidates at ~0.8 recall). The sketch column is
    * computable at write time and bucket-partitionable, making ANN a
    * pruned scan instead of a full one.
    */
  def annLsh(
      s: SparkSession,
      dir: String,
      queryId: Long = 0L,
      k: Int = 10,
      bits: Int = 48,
      dim: Int = 64,
      maxHamming: Int = 20): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .withColumn("sketch", VectorFunctions.hyperplaneSketch(col("embedding"), bits, dim))
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

  /** Assign each row the id of its nearest centroid (cosine), via a
    * struct-least over one fused-cosine distance per centroid — all
    * codegen'd expressions over literal centroid arrays, no UDF, no
    * broadcast variable (each task re-derives the literals from the plan).
    */
  private[graft] def withCentroidId(df: DataFrame, centroids: Array[Array[Float]]): DataFrame = {
    val ranked = centroids.zipWithIndex.map { case (c, i) =>
      val centroidLit = array(c.map(lit(_)).toIndexedSeq: _*).cast("array<float>")
      struct(
        (lit(1.0) - VectorFunctions.cosineSim(col("embedding"), centroidLit)).as("dist"),
        lit(i).as("cid"))
    }
    df.withColumn("cid", least(ranked.toIndexedSeq: _*).getField("cid"))
  }

  /** IVF coarse quantizer: `nlist` centroids, deterministic evenly-spaced
    * init (every n/nlist-th vec_id — the ids are dense, so this picks the
    * same evenly-spaced seeds a rank-based pick would, with a plain pushed
    * filter instead of a global sort: no `Window.orderBy` over the whole
    * table, no single-partition funnel) refined by `iters` Lloyd rounds.
    * Each round is one distributed assignment pass + a per-dimension mean
    * (posexplode → groupBy(cid, dim) → avg); only the nlist×dim centroid
    * matrix ever reaches the driver.
    */
  private[graft] def ivfCentroids(
      e: DataFrame, nlist: Int, iters: Int): Array[Array[Float]] = {
    val n = e.count()
    val step = math.max(1L, n / nlist)
    var centroids: Array[Array[Float]] = e
      .filter(col("vec_id") % step === 0 && col("vec_id") < step * nlist)
      .orderBy(col("vec_id"))
      .select("embedding")
      .collect()
      .map(_.getSeq[Float](0).toArray)

    (0 until iters).foreach { _ =>
      val means = withCentroidId(e, centroids)
        .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .collect()
      val byCid = means.groupBy(_.getInt(0))
      centroids = centroids.indices.map { cid =>
        byCid.get(cid) match {
          case Some(rows) =>
            val c = new Array[Float](rows.length)
            rows.foreach(r => c(r.getInt(1)) = r.getDouble(2).toFloat)
            c
          case None => centroids(cid) // empty cluster keeps its centroid
        }
      }.toArray
    }
    centroids
  }

  /** IVF-bucketed ANN — the second scale path beside [[annLsh]]: a coarse
    * k-means quantizer partitions vectors into `nlist` inverted lists; a
    * query probes only its `nprobe` nearest lists, then exact-cosine
    * reranks that slice (nlist=16/nprobe=4 scans ~25% of vectors at
    * recall ≈1.0 on the fixture). At write time `cid` becomes the
    * partition/bucket column, so the probe is a partition-pruned scan.
    */
  def annIvf(
      s: SparkSession,
      dir: String,
      queryId: Long = 0L,
      k: Int = 10,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 2): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
    val centroids = ivfCentroids(e, nlist, iters)

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
    withCentroidId(e.filter(col("vec_id") =!= queryId), centroids)
      .filter(col("cid").isin(probeCids.map(Integer.valueOf).toIndexedSeq: _*))
      .crossJoin(broadcast(q))
      .withColumn("cos", VectorFunctions.cosineSim(col("embedding"), col("q_emb")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"))
  }

  /** All-vectors k-NN join (each vector's top-k neighbors) — the batch
    * form used by cluster-dedup. Per-key top-k runs through the custom
    * bounded-heap aggregate ([[graft.functions.TopKByScore]]): map-side
    * partial aggregation shrinks the shuffle from all n² candidate pairs
    * to k entries per (group, input partition) — the shape that survives
    * scale. Fixture tier joins all pairs; at 100 TB the join condition
    * becomes sketch-bucket equality.
    */
  def knnJoin(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import graft.functions.TopKByScore.topKByScore
    val e = Tables.embeddings(s, dir)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    a.join(b, col("a_id") =!= col("b_id"))
      .withColumn("cos", VectorFunctions.cosineSim(col("a_emb"), col("b_emb")))
      .groupBy(col("a_id"))
      .agg(topKByScore(col("cos"), col("b_id"), k).as("nbrs"))
      .select(col("a_id"), posexplode(col("nbrs")))
      .select(
        col("a_id"),
        col("col").as("b_id"),
        (col("pos") + 1).cast("int").as("rnk"))
  }

  /** Window-based reference implementation of [[knnJoin]] (same result,
    * O(n²)-row shuffle) — kept for the equivalence test.
    */
  private[graft] def knnJoinWindow(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a_id"))
      .orderBy(col("cos").desc, col("b_id"))
    a.join(b, col("a_id") =!= col("b_id"))
      .withColumn("cos", VectorFunctions.cosineSim(col("a_emb"), col("b_emb")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("a_id", "b_id", "rnk")
  }
}
