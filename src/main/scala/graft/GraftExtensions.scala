package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** The engine's SQL surface: every custom Catalyst expression exposed as a
  * SQL function, both per-session ([[registerAll]], temp functions) and as
  * cluster-level wiring via `SparkSessionExtensions` — the deployment path
  * is `spark.sql.extensions=graft.GraftExtensions`, mirroring how the
  * reference enables Hudi's SQL surface through Spark session config
  * (glue-streaming-job-script/glue_job_script.py:19's `.config(...)` style).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    // Optimizer rules: year(col) <cmp> literal → sargable range
    // ([[graft.plans.YearPredicateToRange]]).
    e.injectOptimizerRule(_ => graft.plans.YearPredicateToRange)
    // Aggregate-over-base → registered materialized rollup
    // ([[graft.plans.MvAggregateRewrite]]); no-op while no MV is
    // registered.
    e.injectOptimizerRule(s => new graft.plans.MvAggregateRewrite(s))
    // Star-join fact-side file pruning through the index family
    // ([[graft.plans.JoinPruneRewrite]]); injected BEFORE the point rule
    // so the dim side's probe is still recognizable when the join is
    // examined (the point rule's serve swaps the dim scan off the
    // registered path).
    e.injectOptimizerRule(s => new graft.plans.JoinPruneRewrite(s))
    // Point-lookup filter over a keyed table's read → candidate-file
    // scan through the record-level index
    // ([[graft.plans.PointLookupRewrite]]); no-op while no keyed table
    // has been read in the session.
    e.injectOptimizerRule(s => new graft.plans.PointLookupRewrite(s))
    // Aggregates over a keyed table's read → answered from the
    // column-stats sidecar (whole-table / partition-filtered: no scan;
    // range-filtered: full files fold, boundary files scan)
    // ([[graft.plans.StatsAggregateRewrite]]). Injected BEFORE the range
    // rule: both match a range filter over a registered scan, and once
    // the range rule swaps the scan onto its candidate files the
    // aggregate rule can no longer recognize the table — the hybrid
    // serve strictly dominates there (it opens only the BOUNDARY subset
    // of the range candidates). When the hybrid declines, the range
    // rule still serves the same filter in the same pass.
    e.injectOptimizerRule(s => new graft.plans.StatsAggregateRewrite(s))
    // ORDER BY col LIMIT k over a keyed table's read → scan only the
    // files that can hold a top-k row, via the column-stats sidecar
    // ([[graft.plans.TopKPruneRewrite]]). Injected BEFORE the range
    // rule for the same reason the aggregate rule is: a FILTERED top-k
    // matches both (the filter alone is the range rule's shape), and
    // the top-k walk strictly dominates there — it opens O(k) of the
    // range's candidate files instead of all of them. When the walk
    // declines, the range rule still serves the filter in the same
    // pass.
    e.injectOptimizerRule(s => new graft.plans.TopKPruneRewrite(s))
    // rank()/row_number() ≤ N per table-partition group over a keyed
    // read → scan only each group's top-N candidate files
    // ([[graft.plans.GroupTopKRewrite]] — the per-group twin of the
    // sorted-limit rule, same position: before the range rule so the
    // O(N·groups) walk wins any shape both could touch).
    e.injectOptimizerRule(s => new graft.plans.GroupTopKRewrite(s))
    // Range filter over a keyed table's read → file-skipping scan
    // through the column-stats sidecar ([[graft.plans.RangePruneRewrite]]);
    // same registry gate as the point rule.
    e.injectOptimizerRule(s => new graft.plans.RangePruneRewrite(s))
    // Resolution hook: when a query references a table the session
    // catalog doesn't know, consult the persistent registry
    // ([[graft.table.GraftCatalog]]) before resolution fails — discovery
    // at name-resolution time, exactly when a Hive metastore would be
    // consulted. No-op unless spark.graft.catalog.registry is set.
    e.injectResolutionRule(s => new graft.plans.RegistryDiscovery(s))
  }
}

object GraftExtensions {

  /** name → Expression builder, shared by both registration paths. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (es => CosineSimilarity(es.head, es(1))),
    "dot_product" -> (es => DotProduct(es.head, es(1))),
    "hamming64" -> (es => HammingDistance64(es.head, es(1))),
    "rolling_hash" -> (es => RollingHash(es.head)),
    "simhash64" -> (es => SimHash64(es.head)),
    "sorted_intersect_count" -> (es => SortedIntersectCount(es.head, es(1))),
    "minhash_signature" -> (es =>
      MinHashSignature(
        es.head,
        es(1).eval().asInstanceOf[Number].intValue()))
  )

  /** Session-scoped registration (temp functions) — `spark.sql` can then
    * call every engine function directly.
    */
  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
