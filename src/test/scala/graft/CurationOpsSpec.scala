package graft

import graft.operators.{Curation, TextAnalysis}

/** Structural invariants of the training-prep operators — properties the
  * value-level DuckDB oracles can't express directly (coverage, overlap,
  * budget discipline).
  */
class CurationOpsSpec extends SparkTestBase {

  test("cluster labels are a table-side sidecar: consumers scan parquet, nothing driver-resident") {
    import org.apache.spark.sql.functions._
    // Both consumers must read the PERSISTED labels sidecar — a real
    // parquet scan with distributed partitioning, never a re-parallelized
    // driver collection (the 100 TB label set is a table, not a driver
    // data structure).
    def scanned(df: org.apache.spark.sql.DataFrame) =
      graft.plans.PlanWalk.scannedFiles(df)
    val labels = graft.operators.Dedup.nearDupClusters(spark, sf0001)
    val lblFiles = scanned(labels)
    assert(lblFiles.nonEmpty && lblFiles.forall(_.contains("graft_ndlabels")),
      s"nearDupClusters must scan the labels sidecar, scanned $lblFiles")
    assert(labels.rdd.getNumPartitions > 1,
      "the sidecar read must be distributed, not a 1-partition replay")
    val splitFiles = scanned(
      graft.operators.Curation.clusterAwareSplit(spark, sf0001))
    assert(splitFiles == lblFiles,
      "the cluster-aware split must scan the same labels sidecar")
    // Path (not rows) is memoized: repeated calls serve the same files.
    assert(scanned(graft.operators.Dedup.nearDupClusters(spark, sf0001))
      == lblFiles)
    // The labels themselves: every doc labeled exactly once, reps are
    // fixed points (a representative's own label is itself).
    val n = graft.sources.Tables.documents(spark, sf0001).count()
    assert(labels.count() == n)
    assert(labels.select("doc_id").distinct().count() == n)
    val reps = labels.select(col("cluster_rep").as("doc_id")).distinct()
    val fixed = labels.join(reps, "doc_id")
      .filter(col("doc_id") =!= col("cluster_rep")).count()
    assert(fixed == 0L, "every representative must be its own fixed point")
  }

  test("cluster-aware split: near-dup pairs never cross splits; singletons keep the plain split") {
    import org.apache.spark.sql.functions._
    val split = graft.operators.Curation.clusterAwareSplit(spark, sf0001)
      .cache()
    try {
      // Every near-dup pair lands in ONE split — leakage impossible by
      // construction (the property q53 hunts violations of).
      val pairs = graft.operators.Dedup.minhashLsh(spark, sf0001)
      val a = split.select(col("doc_id").as("a_id"), col("split").as("a_s"))
      val b = split.select(col("doc_id").as("b_id"), col("split").as("b_s"))
      val crossing = pairs.join(a, "a_id").join(b, "b_id")
        .filter(col("a_s") =!= col("b_s")).count()
      assert(crossing == 0L, "a near-dup pair crossed splits")
      // Documents in no pair keep their own id as representative, so
      // their split equals the plain id-keyed split.
      val paired = pairs.select(col("a_id").as("doc_id"))
        .unionByName(pairs.select(col("b_id").as("doc_id"))).distinct()
      val singletonMismatch = split.join(paired, Seq("doc_id"), "left_anti")
        .filter(col("split") =!=
          graft.operators.Curation.splitExpr(col("doc_id"))).count()
      assert(singletonMismatch == 0L,
        "singletons must split exactly like the plain split")
      // Representatives are cluster-consistent: one split per rep.
      assert(split.groupBy("cluster_rep")
        .agg(countDistinct(col("split")).as("n"))
        .filter(col("n") > 1).count() == 0L)
    } finally split.unpersist()
  }

  test("chunking invariants: full coverage, exact stride, short final chunk") {
    val rows = TextAnalysis.chunks(spark, sf0001, chunkTokens = 32, stride = 24)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "size(split(text, ' ')) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.keySet == docs.keySet, "every document chunks")
    rows.foreach { case (id, cs) =>
      val n = docs(id)
      val sorted = cs.sortBy(_.getAs[Int]("chunk_id"))
      // starts advance by exactly the stride from zero
      assert(sorted.map(_.getAs[Int]("chunk_start")).toSeq ==
        sorted.indices.map(_ * 24))
      // every token position is covered: the last chunk reaches the end
      val last = sorted.last
      assert(last.getAs[Int]("chunk_start") + last.getAs[Int]("n_chunk_tokens") == n)
      // every chunk except the last is full-size
      sorted.dropRight(1).foreach(c => assert(c.getAs[Int]("n_chunk_tokens") == 32))
      assert(last.getAs[Int]("n_chunk_tokens") <= 32)
    }
  }

  test("packing invariants: pack ids contiguous from 0, placement = prior tokens div budget") {
    val ctx = 256
    Curation.sequencePacking(spark, sf0001, ctxTokens = ctx).collect()
      .groupBy(_.getAs[String]("source"))
      .foreach { case (_, rs) =>
        val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
        val packs = sorted.map(_.getAs[Long]("pack_id")).toSeq
        assert(packs.head == 0L &&
          packs.zip(packs.tail).forall { case (a, b) => a <= b })
        var cum = 0L
        sorted.foreach { r =>
          assert(r.getAs[Long]("pack_id") == cum / ctx)
          cum += r.getAs[Long]("n_tokens")
        }
      }
  }

  test("domain mix: per-source selections honor the integer targets exactly") {
    val out = Curation.domainMix(spark, sf0001, budget = 60).collect()
    val perSource = out.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    // sf0.001: equal-sized sources -> equal integer targets; total <= budget
    assert(perSource.values.toSet.size == 1, s"unequal picks: ${perSource.toMap}")
    assert(out.length <= 60)
    // ranks are 1..target within each source
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rs.length))
    }
  }

  test("group sample: exactly k per language, deterministic across runs") {
    val k = 7
    val a = Curation.groupSample(spark, sf0001, k = k).collect()
    val langs = graft.sources.Tables.documents(spark, sf0001)
      .select("lang").distinct().count()
    assert(a.length == langs * k)
    a.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to k))
      assert(rs.map(_.getAs[Long]("doc_id")).distinct.length == k)
    }
    val b = Curation.groupSample(spark, sf0001, k = k).collect()
    assert(a.map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet ==
      b.map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet)
  }

  test("co-occurrence: pair counts bounded by endpoint doc frequencies, vocab bounded") {
    val rows = TextAnalysis.cooccurrence(spark, sf0001, vocabSize = 10).collect()
    val terms = rows.flatMap(r =>
      Seq(r.getAs[String]("term_a"), r.getAs[String]("term_b"))).distinct
    assert(terms.length <= 10, "pairs drawn from outside the bounded vocabulary")
    rows.foreach { r =>
      val (na, nb, both) =
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_both"))
      assert(both >= 1 && both <= math.min(na, nb))
      assert(r.getAs[String]("term_a") < r.getAs[String]("term_b"))
    }
  }

  test("oov stats: counts are consistent and bounded per doc") {
    val rows = TextAnalysis.oovStats(spark, sf0001, vocabSize = 5).collect()
    rows.foreach { r =>
      val (n, oov, oovD) = (r.getAs[Int]("n_tokens"),
        r.getAs[Int]("n_oov"), r.getAs[Int]("n_oov_distinct"))
      assert(oov >= 0 && oov <= n)
      assert(oovD <= oov)
    }
  }
}
