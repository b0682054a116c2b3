package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: the sf0.1 → sf1 blocking-curve smoke. Times the dedup/ANN
  * family once per tier (after a JIT warmup pass at sf0.001, so the
  * measured run is code-warm but cache-cold for its tier — it includes
  * the full per-doc shingle/sign/index work) and prints the ratio table
  * recorded in BASELINE.md. Near-linear ratios (≤ ~15× for 10× rows)
  * prove the blocking joins stay join-shaped; a quadratic surprise here
  * is exactly what the sf0.1 bench cannot catch.
  *
  * Usage: runMain graft.ScaleSmoke [smallDir] [bigDir] [warmDir]
  */
object ScaleSmoke {
  val family: Seq[String] = Seq(
    "q31_dedup_ngram",
    "q32_dedup_minhash",
    "q33_dedup_simhash",
    "q34_embed_dedup",
    "q96_para_dedup",
    "q97_edit_dedup",
    "q51_dedup_clusters",
    "q98_similar_neighbors",
    "q41_knn_join",
    // round-7 additions with their own scale curves to prove
    "q103_embed_gram",
    "q105_upsert_bloom",
    "q106_kmv_distinct",
    "q111_daily_resample",
    "q112_sessionize",
    // round-8 write/table-family curves: positioned-windows candidate
    // generation (q100), WAP three-commit lifecycle (q114), cross-
    // generation layout read (q116), z-order + 2-D stats prune (q120)
    "q100_shared_runs",
    "q114_write_audit_publish",
    "q116_partition_evolution",
    "q120_zorder_pruned",
    // round-8 batch-2: streaming enrichment/dedup state curves, CDC
    // replica application, debris cleaner (metadata-only — its curve is
    // the file-listing cost)
    "q123_stream_enrich",
    "q124_stream_dedup",
    "q125_cdc_replica",
    "q126_rollback_debris",
    // round-9: pair counting over the token stream (q127), MV build +
    // re-served aggregate (q128 — the build scan dominates and scales
    // with the base), per-image decode + hash + one key exchange (q129)
    "q127_bpe_pairs",
    "q128_mv_rewrite",
    "q129_image_phash",
    "q130_phash_near",
    // round-10: candidate-bound phash curve (hash diversity grows with
    // the corpus — smoke-only variant, no SparkEntry/oracle entry),
    // star-join MV build + re-served join aggregate
    "q130_phash_diverse",
    "q136_mv_join",
    // round-12: the index family end-to-end (each builds its table +
    // sidecars at the tier then serves — the ratio proves the BUILD is
    // linear; the serve side is O(probe + delta) by construction and
    // dominated here by the build)
    "q145_rli_lookup",
    "q146_secondary_lookup",
    "q147_plan_lookup",
    "q149_stream_lookup_join",
    "q151_range_prune",
    "q152_stats_agg",
    "q153_stream_table_feed",
    "q154_stats_group_agg",
    "q155_indexed_delete",
    "q156_layout_advisor")

  /** Smoke-only variants that deliberately have no SparkEntry/oracle
    * entry (their oracles would have to model a corpus the driver does
    * not ship).
    */
  val extras: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map("q130_phash_diverse" ->
      ((s, d) => graft.operators.Multimodal.phashNearDupDiverse(s, d)))

  def main(args: Array[String]): Unit = {
    val small = args.headOption.getOrElse("/root/testdata/sf0.1")
    val big = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val warm = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    // Trailing names restrict the run — one query in a fresh JVM is the
    // interference-free measurement mode (BASELINE §6's q41 question).
    val chosen = if (args.length > 3) args.drop(3).toSeq else family
    val spark = Sessions.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries.getOrElse(name, extras(name))(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    chosen.foreach(time(_, warm)) // JIT + codegen warmup only
    val rows = chosen.map { name =>
      val ts = time(name, small)
      val tb = time(name, big)
      println(f"[scalesmoke] $name%-22s sf0.1=$ts%7.2f s  sf1=$tb%7.2f s  ratio=${tb / ts}%5.1f x")
      (name, ts, tb)
    }
    println("| query | sf0.1 (s) | sf1 (s) | ratio |")
    println("|---|---|---|---|")
    rows.foreach { case (n, ts, tb) =>
      println(f"| $n | $ts%.2f | $tb%.2f | ${tb / ts}%.1f x |")
    }
    spark.stop()
  }
}
