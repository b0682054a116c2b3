package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorFunctions
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the embeddings fixture
  * (`ArrayType(FloatType)`, dim 64 — FIXTURES.md). Three tiers per the
  * build plan (SURVEY §7.4): brute-force cosine top-k as the exactness
  * baseline, a random-hyperplane-LSH filtered variant, and an IVF
  * (inverted-file) bucketed variant. The sketch/probe parameters default
  * to values calibrated for recall = 1.0 on the synthetic fixtures (its
  * neighbors sit at cosine ≈0.3 — far weaker separation than real
  * embedding corpora), so each variant's output equals the brute-force
  * top-k and is oracle-checkable; production corpora with near-dup
  * neighbors at cosine ≥0.9 would use much tighter budgets (maxHamming
  * ≈ bits/8, nprobe ≈ nlist/16) for the same recall.
  */
object Similarity {

  /** Exact top-k cosine neighbors of `queryId`'s vector: one broadcast of
    * the single query row, a codegen'd fused cosine per candidate, then
    * TakeOrderedAndProject (per-partition top-k + driver merge — no global
    * sort). At 100 TB this is one full scan; `annLsh`/`annIvf` avoid it.
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

  /** LSH-filtered ANN: 48-bit random-hyperplane sketch per vector; the
    * query probes only vectors whose sketch is within `maxHamming` bits of
    * its own (cheap integer filter), then exact-cosine reranks that
    * candidate pool. `maxHamming` defaults to 26: the fixture's true
    * top-10 sits at sketch Hamming ≤ 25 (measured by `graft.Calibrate`),
    * so the rerank pool contains the whole exact answer and the output
    * equals [[annBrute]]'s — asserted by the equivalence spec and the
    * DuckDB oracle. The sketch column is computable at write time and
    * bucket-partitionable (see [[graft.table.SketchedTable]]), making ANN
    * a pruned scan instead of a full one.
    */
  def annLsh(
      s: SparkSession,
      dir: String,
      queryId: Long = 0L,
      k: Int = 10,
      bits: Int = 48,
      dim: Int = 64,
      maxHamming: Int = 26): DataFrame = {
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

  /** Assign each row the id of its nearest centroid (cosine) through the
    * [[graft.functions.NearestCentroids]] kernel. History of this shape:
    * round 1–7 unrolled one fused cosine per centroid
    * (`least(struct(dist_i, i), …)`), round 8 shrank each centroid to a
    * single `typedlit` constant reference — and the Project STILL crossed
    * Janino's 64 KB method limit at nlist=64 × dim=64 (3 interpreted-mode
    * fallbacks per sf1 smoke, `references[511]`). The kernel generates one
    * constant-size call whatever nlist is, so the stage stays inside
    * whole-stage codegen; tie semantics (dist asc, cid asc) and the exact
    * double arithmetic are unchanged.
    */
  private[graft] def withCentroidId(df: DataFrame, centroids: Array[Array[Float]]): DataFrame =
    df.withColumn("cid",
      element_at(VectorFunctions.nearestCentroids(col("embedding"), centroids, 1), 1))

  /** The row's `nprobe` nearest centroid ids, nearest first — the same
    * [[graft.functions.NearestCentroids]] kernel with k = nprobe (ranked
    * by distance then cid, deterministic ties; see [[withCentroidId]] for
    * why this is a kernel and not an `array_sort(array(struct…))`).
    */
  private[graft] def probeList(
      centroids: Array[Array[Float]], nprobe: Int,
      emb: Column = col("embedding")): Column =
    VectorFunctions.nearestCentroids(emb, centroids, nprobe)

  /** IVF coarse quantizer: `nlist` centroids, deterministic evenly-spaced
    * init (every n/nlist-th vec_id — the ids are dense, so this picks the
    * same evenly-spaced seeds a rank-based pick would, with a plain pushed
    * filter instead of a global sort: no `Window.orderBy` over the whole
    * table, no single-partition funnel) refined by `iters` Lloyd rounds.
    * Each round is one distributed assignment pass + a per-dimension mean
    * (posexplode → groupBy(cid, dim) → exact-decimal sum ÷ count — the
    * same order-independent arithmetic as [[Exact]], so the centroids are
    * bit-identical under any partitioning or core count); only the
    * nlist×dim centroid matrix ever reaches the driver.
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

    // Lloyd trains on a bounded deterministic sample — min(256·nlist, n)
    // rows via a pushed vec_id-stride filter (dense ids ⇒ an even, seedless
    // sample; no shuffle). Quantizer quality needs O(rows-per-centroid)
    // evidence, not the corpus: at 100 TB, `iters+1` full passes to train
    // a nlist×dim codebook would dominate the index build for no recall
    // gain (standard IVF practice, e.g. FAISS's train-on-sample default).
    val stride = math.max(1L, n / math.max(1L, math.min(256L * nlist, n)))
    val train =
      if (stride <= 1L || iters == 0) e
      else e.filter(col("vec_id") % stride === 0).persist()

    (0 until iters).foreach { _ =>
      val means = withCentroidId(train, centroids)
        .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg((sum(col("x").cast(DecimalType(28, 12))).cast("double") /
          count(col("x"))).as("m"))
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
    if (!(train eq e)) train.unpersist()
    centroids
  }

  // ── product quantization (Jégou/Douze/Schmid, TPAMI 2011) ───────────
  // The third classical ANN sketch beside the hyperplane LSH and IVF: the
  // L2-normalized vector is cut into `m` subvectors, each quantized to one
  // of `ksub` per-subspace centroids, so a vector compresses to m small
  // codes (packed into one long here). A query scores candidates with an
  // asymmetric-distance table — m lookups + adds per candidate, no
  // per-candidate float math — then the exact cosine reranks the best
  // `rerank` survivors. Normalization makes ADC's L2 order the cosine
  // order, so with a calibrated rerank budget the output equals the exact
  // top-k (the fixture's near-random geometry needs rerank≈200/500; real
  // embedding corpora with near-dup structure prune orders of magnitude
  // harder).

  private[graft] def normalized(v: Array[Float]): Array[Float] = {
    var ss = 0.0; var i = 0
    while (i < v.length) { ss += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(ss)
    if (n == 0) v.clone() else v.map(x => (x / n).toFloat)
  }

  /** Deterministic in-memory k-means (evenly-spaced seeds over the sample,
    * fixed iteration count, empty clusters keep their centroid) — the
    * per-subspace codebook trainer. Driver-side by design: codebook
    * training needs a bounded sample (min(256·ksub, n) rows collected via
    * the same vec_id stride as [[ivfCentroids]]), never the corpus.
    */
  private[graft] def kmeansLocal(
      xs: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    val n = xs.length
    var cents = Array.tabulate(math.min(k, n)) { i =>
      xs(((i.toLong * (n - 1)) / math.max(1, k - 1)).toInt).clone()
    }
    (0 until iters).foreach { _ =>
      val sums = Array.fill(cents.length)(new Array[Double](xs.head.length))
      val counts = new Array[Long](cents.length)
      xs.foreach { x =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < cents.length) {
          var d = 0.0; var j = 0
          while (j < x.length) {
            val t = x(j) - cents(c)(j); d += t * t; j += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var j = 0
        while (j < x.length) { sums(best)(j) += x(j); j += 1 }
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else sums(c).map(v => (v / counts(c)).toFloat)
      }
    }
    cents
  }

  /** Train PQ codebooks: m × ksub × (dim/m), over the normalized stride
    * sample.
    */
  private[graft] def pqTrain(
      e: DataFrame, m: Int, ksub: Int, dim: Int,
      iters: Int = 5): Array[Array[Array[Float]]] = {
    val n = e.count()
    val stride = math.max(1L, n / math.max(1L, math.min(256L * ksub, n)))
    val sample = e.filter(col("vec_id") % stride === 0)
      .select("embedding").collect()
      .map(r => normalized(r.getSeq[Float](0).toArray))
    val d = dim / m
    Array.tabulate(m) { mi =>
      kmeansLocal(
        sample.map(v => java.util.Arrays.copyOfRange(v, mi * d, mi * d + d)),
        ksub, iters)
    }
  }

  /** The packed PQ code of `emb` (byte per subspace, low byte = subspace
    * 0): per subspace, argmin over centroids of the L2 distance between
    * the normalized subvector and the centroid — expressed through the
    * identity ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖², so the per-centroid work is
    * one fused [[VectorFunctions.dotProduct]] (codegen'd) plus constants,
    * ranked by `least` over (dist, code) structs (deterministic ties).
    * Write-time cost, amortized like the sketch/cid columns.
    */
  private[graft] def pqCodeExpr(
      emb: Column, codebooks: Array[Array[Array[Float]]]): Column =
    // [[graft.functions.PqCode]] kernel: the per-(mi, code) composed form
    // — one fused dot per codebook entry, `least` over (dist, code)
    // structs — unrolled m × ksub work into the write-time Project and
    // crossed Janino's 64 KB method limit (the last of the three sf1-smoke
    // interpreted-mode fallbacks). The kernel keeps the identity-based
    // L2 argmin (zero-vector norm branch included) in one constant-size
    // generated call; ties still resolve to the smaller code.
    VectorFunctions.pqCode(emb, codebooks)

  /** Per-subspace ADC table for a (normalized) query: tbl(mi)(c) =
    * ‖q_sub − c‖². Kilobytes; travels as plan literals.
    */
  private[graft] def pqAdcTables(
      q: Array[Float], codebooks: Array[Array[Array[Float]]]): Array[Array[Double]] = {
    val m = codebooks.length
    val d = codebooks.head.head.length
    Array.tabulate(m) { mi =>
      codebooks(mi).map { c =>
        var s = 0.0; var j = 0
        while (j < d) {
          val t = q(mi * d + j) - c(j); s += t * t; j += 1
        }
        s
      }
    }
  }

  /** ADC score of a packed `pq` code column: m table lookups + adds, all
    * builtin codegen'd expressions (element_at over literal arrays).
    */
  private[graft] def pqAdcExpr(pq: Column, tables: Array[Array[Double]]): Column =
    tables.zipWithIndex.map { case (tbl, mi) =>
      val arr = typedlit(tbl.toSeq) // single constant ref, not ksub inline literals
      element_at(
        arr,
        (shiftrightunsigned(pq, 8 * mi).bitwiseAND(lit(255L)).cast("int") + 1))
    }.reduce(_ + _)

  /** IVF-bucketed ANN — the second scale path beside [[annLsh]]: a coarse
    * k-means quantizer partitions vectors into `nlist` inverted lists; a
    * query probes only its `nprobe` nearest lists, then exact-cosine
    * reranks that slice. `nprobe` defaults to 8: the fixture's true top-10
    * spreads across probe ranks ≤ 6 (measured by `graft.Calibrate`), so
    * the probed slice contains the whole exact answer and the output
    * equals [[annBrute]]'s. At write time `cid` becomes the
    * partition/bucket column (see [[graft.table.SketchedTable]]), so the
    * probe is a partition-pruned scan.
    */
  def annIvf(
      s: SparkSession,
      dir: String,
      queryId: Long = 0L,
      k: Int = 10,
      nlist: Int = 16,
      nprobe: Int = 8,
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
    * form used by cluster-dedup. Candidate generation is an equality join
    * on IVF cell id: the left side explodes each vector's `nprobe`
    * nearest-cell probes, the right side carries each vector's single
    * cell, and only same-cell pairs meet — a shuffle hash join keyed on
    * cid, never a broadcast of the full table (the round-1 shape was a
    * BroadcastNestedLoopJoin, impossible at 100 TB). With the default
    * `nprobe = nlist` every cell is probed, so the candidate set is every
    * pair (exact k-NN, matching the DuckDB oracle) while the join stays
    * key-partitioned; `nprobe < nlist` is the approximate knob that makes
    * compute sublinear in n² at scale. Seed centroids (`iters = 0`)
    * suffice: with all cells probed, centroid quality affects only bucket
    * balance, not the result.
    *
    * Per-key top-k runs through the custom bounded-heap aggregate
    * ([[graft.functions.TopKByScore]]): map-side partial aggregation
    * shrinks the shuffle from all candidate pairs to k entries per
    * (group, input partition) — the shape that survives scale.
    */
  def knnJoin(
      s: SparkSession,
      dir: String,
      k: Int = 5,
      nlist: Int = 32,
      nprobe: Int = -1): DataFrame = {
    import graft.functions.TopKByScore.topKByScore
    val e = Tables.embeddings(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
    val centroids = ivfCentroids(e, nlist, 0)
    val probes = if (nprobe <= 0) centroids.length else nprobe

    // Candidate generation is ids-only: the exploded probe side carries
    // (a_id, probe_cid) — two longs — so the cid join shuffles narrow rows,
    // never `probes` copies of the embedding arrays. Embeddings are
    // re-attached to the candidate stream afterwards by plain equi-joins
    // (broadcast-sized here; key-partitioned at scale), keeping the
    // expensive fused cosine in one codegen stage over narrow inputs.
    val aProbe = e
      .select(col("vec_id").as("a_id"), col("embedding"))
      .withColumn("probe_cid", explode(probeList(centroids, probes)))
      .select("a_id", "probe_cid")
    val bCid = withCentroidId(e, centroids)
      .select(col("cid"), col("vec_id").as("b_id"))
    val aEmb = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val bEmb = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    aProbe.join(bCid, col("probe_cid") === col("cid") && col("a_id") =!= col("b_id"))
      .select("a_id", "b_id")
      .join(aEmb, "a_id")
      .join(bEmb, "b_id")
      .withColumn("cos", VectorFunctions.cosineSim(col("a_emb"), col("b_emb")))
      .groupBy(col("a_id"))
      .agg(topKByScore(col("cos"), col("b_id"), k).as("nbrs"))
      .select(col("a_id"), posexplode(col("nbrs")))
      .select(
        col("a_id"),
        col("col").as("b_id"),
        (col("pos") + 1).cast("int").as("rnk"))
  }

  /** Thresholded k-NN join — each vector's top-k neighbors ABOVE a cosine
    * floor: the similarity-join shape a dedup/linkage pipeline actually
    * runs at 100 TB (nobody ranks noise; you want neighbors above a
    * similarity bar). This is where the IVF `nprobe < nlist` knob earns
    * its keep, and the reason [[knnJoin]] cannot use it on this data:
    * global UNthresholded top-5 recall needs nprobe = nlist here
    * (`graft.Calibrate`: max needed = 16 of 16 — unplanted neighbors are
    * noise, and noise doesn't cluster), while the ≥ 0.46 pairs are
    * near-identical vectors that quantize to nearby cells: measured max
    * symmetric probe rank 6 of nlist=64, so nprobe=8 (margin 2) catches
    * every qualifying pair while generating ~21% of all pairs (5×
    * sublinear; the margins and the 0.46 threshold's float safety —
    * nearest cosines 0.459667 / 0.466641, vs ~1e-7 float32 error — are
    * all in `Calibrate`'s q98 block).
    *
    * Exactness contract: a pair (a,b) with cos ≥ threshold is caught when
    * EITHER side probes the other's cell (symmetric rank ≤ nprobe), so
    * directed candidates are mirrored before the verify — both output
    * directions exist even when only one side's probe list covers the
    * other. All joins stay keyed (cid, then ids); the verify cosine runs
    * once per undirected candidate's two directions over narrow ids-only
    * shuffles, and per-a top-k goes through the bounded-heap aggregate
    * exactly like [[knnJoin]].
    */
  def similarNeighbors(
      s: SparkSession,
      dir: String,
      k: Int = 5,
      threshold: Double = 0.46,
      nlist: Int = 64,
      nprobe: Int = 8,
      iters: Int = 2): DataFrame = {
    import graft.functions.TopKByScore.topKByScore
    val e = Tables.embeddings(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
    // The codebook is INDEX-BUILD state, not query state: FAISS trains
    // the coarse quantizer once when the index is built and every search
    // reuses it. Memoized per (session, dir, params) like SketchedTable's
    // write-time columns; the search below runs in full per invocation.
    val centroids = centroidCache.getOrElseUpdate(
      (System.identityHashCode(s), dir, nlist, iters),
      ivfCentroids(e, nlist, iters))
    // Probe rows CARRY the query embedding — the standard distributed
    // ANN query shape (the query vector ships to each probed shard, FAISS
    // sharded search does the same): a-side shuffle is nprobe × n × dim,
    // and in exchange the cosine verify FUSES into the join's codegen
    // stage, so candidate pairs are born, scored, and threshold-filtered
    // in one pass and never shuffle again. (q41's unthresholded join
    // keeps the opposite trade — ids-only candidates, re-attach later —
    // because nothing filters its n×k survivors.) Threshold selectivity
    // makes this the win here: of ~500k candidates at sf0.1 only ~75
    // pairs survive, so dedup + mirror run on dozens of rows.
    val aProbe = e
      .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      .withColumn("probe_cid",
        explode(probeList(centroids, nprobe, col("a_emb"))))
    val bCid = withCentroidId(e, centroids)
      .select(col("cid"), col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val verified = aProbe
      .join(bCid, col("probe_cid") === col("cid") && col("a_id") =!= col("b_id"))
      .withColumn("cos", VectorFunctions.cosineSim(col("a_emb"), col("b_emb")))
      .filter(col("cos") >= threshold)
      // canonicalize + dedup the SURVIVORS (a pair probed from both
      // directions appears twice): dozens of rows, not candidates
      .select(
        least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"),
        col("cos"))
      .dropDuplicates("a_id", "b_id")
    verified
      .union(verified.select(col("b_id"), col("a_id"), col("cos")))
      .groupBy(col("a_id"))
      .agg(topKByScore(col("cos"), col("b_id"), k).as("nbrs"))
      .select(col("a_id"), posexplode(col("nbrs")))
      .select(
        col("a_id"),
        col("col").as("b_id"),
        (col("pos") + 1).cast("int").as("rnk"))
  }

  /** Codebook memo for [[similarNeighbors]] — see the index-build note
    * there. Values are plain float arrays (session-independent data);
    * the session-identity key prevents reuse across sessions whose conf
    * might differ.
    */
  private val centroidCache =
    scala.collection.concurrent.TrieMap
      .empty[(Int, String, Int, Int), Array[Array[Float]]]

  /** Window-based reference implementation of [[similarNeighbors]] (same
    * result, O(n²)-row shuffle) — kept for the equivalence test.
    */
  private[graft] def similarNeighborsWindow(
      s: SparkSession, dir: String, k: Int = 5, threshold: Double = 0.46): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a_id"))
      .orderBy(col("cos").desc, col("b_id"))
    a.join(b, col("a_id") =!= col("b_id"))
      .withColumn("cos", VectorFunctions.cosineSim(col("a_emb"), col("b_emb")))
      .filter(col("cos") >= threshold)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("a_id", "b_id", "rnk")
  }

  /** Per-label embedding centroids (class means), one output row per
    * (label, dimension): the prototype vectors of classification /
    * nearest-class-mean curation and the quality report over a labelled
    * embedding column. Shape: one posexplode (rows × dims) into one
    * map-side-combined aggregate keyed by (label, dim) — the standard
    * dimension-transpose aggregation; the shuffle after partial
    * aggregation carries at most labels × dims rows per partition
    * regardless of corpus size. Means run through exact decimal
    * ([[Exact]]'s rule, scale 6) so the doubles are partition-order-
    * stable and engine-exact — a float's promoted double can never sit
    * exactly on a decimal rounding boundary (boundaries are non-dyadic),
    * so both engines round each value identically.
    */
  def labelCentroids(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos").cast("int").as("dim"))
      .agg((sum(col("col").cast("double").cast("decimal(28,6)")).cast("double") /
        count(lit(1))).as("centroid"))

  /** Fixed-point gram matrix of the embedding corpus — the d×d second
    * moment Σ_v q(v)·q(v)ᵀ that PCA / whitening / covariance pipelines
    * compute before training (upper triangle; d = 64). Two deliberate
    * choices:
    *
    *   - FIXED-POINT: dimensions are quantized q = ⌊100·x⌋ (float→double
    *     widening is exact, one IEEE multiply and floor are bit-identical
    *     across engines), so the sum is INTEGER — exactly associative,
    *     independent of partitioning, and cross-engine reproducible. A
    *     double sum of n·d² float products is none of those things.
    *   - NO JOIN, NO EXPLODE: the d(d+1)/2 pair products accumulate into
    *     a single per-partition buffer ([[graft.functions.GramMatrix]], a
    *     tight-loop `TypedImperativeAggregate`) — each input row is d²/2
    *     multiply-adds into an array, not d²/2 GENERATED ROWS each paying
    *     a hash-aggregate probe (the explode shape this replaced was ~4×
    *     slower at sf0.1). Partial buffers merge element-wise, so the
    *     shuffle is O(partitions·d²) longs, independent of corpus size.
    *     The naive shapes (self-join on vec_id, or exploding to (vec_id,
    *     dim, value) and joining) shuffle O(n·d) or worse.
    */
  def embeddingGram(s: SparkSession, dir: String, dim: Int = 64): DataFrame = {
    val q = transform(col("embedding"),
      x => floor(x.cast("double") * 100).cast("long"))
    Tables.embeddings(s, dir)
      .agg(graft.functions.GramMatrix.gramMatrix(q, dim).as("g"))
      .select(explode(col("g")).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"), col("e.p").as("gram"))
  }

  /** Int8 symmetric quantization audit (q122) — the storage-compression
    * decision every embedding corpus faces (4× smaller than float32,
    * 8× smaller than float64): per vector, the per-tensor scale
    * (max |x|), the worst-dimension reconstruction error after
    * round(x/scale·127) dequantization, and how many dimensions survive
    * bit-exact. Pure per-row map through codegen'd higher-order
    * functions — transform/array_max/filter over the embedding array,
    * NO shuffle, no explode: the 100 TB shape is "scan, score, write",
    * scaling with input splits alone. Both engines evaluate the same
    * IEEE expression tree ((x/scale)·127 rounded half-away-from-zero,
    * (q·scale)/127 back), so errors compare bit-for-bit. All-zero
    * vectors (scale = 0) dequantize to zero exactly rather than
    * dividing by zero; zero-LENGTH vectors are excluded on both engines
    * (there is nothing to quantize — and the SQL side's unnest drops
    * them implicitly, so the explicit filter keeps the row sets equal).
    */
  def int8QuantStats(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .filter(size(col("embedding")) > 0)
      .select(
        col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("scale", array_max(transform(col("e"), x => abs(x))))
    def dequant(x: Column): Column =
      when(col("scale") === 0d, lit(0d))
        .otherwise(round(x / col("scale") * 127) * col("scale") / 127)
    base.select(
      col("vec_id"),
      col("scale"),
      array_max(transform(col("e"), x => abs(x - dequant(x)))).as("max_abs_err"),
      size(filter(col("e"), x => x === dequant(x))).cast("int").as("n_exact"))
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
