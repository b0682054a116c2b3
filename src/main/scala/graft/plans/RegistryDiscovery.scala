package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.table.GraftCatalog

/** Analyzer hook for persistent-catalog discovery (the metastore-lookup
  * moment of hive_sync, glue_job_script.py:64-73): when a plan still
  * contains an [[UnresolvedRelation]] after `ResolveRelations` had its
  * turn, replay the central registry ([[GraftCatalog.replayIfStale]])
  * into the session catalog and substitute the freshly registered
  * relation in place — the same plan-substitution move view resolution
  * makes. Substituting ourselves matters: this rule runs LAST in the
  * resolution batch, so "replay and wait for the next fixed-point pass"
  * would end the batch (a no-change iteration terminates it) before
  * `ResolveRelations` ever saw the new table. The mtime guard inside
  * replayIfStale bounds the steady-state cost to one file-status call
  * per query that references a table (zero when no registry is
  * configured), and the substitution only fires for a name that exists
  * in the catalog at this point — which, given our position after
  * `ResolveRelations`, means a name the replay just registered.
  */
class RegistryDiscovery(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!GraftCatalog.isConfigured(spark) ||
        plan.collectFirst { case u: UnresolvedRelation => u }.isEmpty) plan
    else {
      GraftCatalog.replayIfStale(spark)
      plan.resolveOperatorsUp {
        case u: UnresolvedRelation
            if u.multipartIdentifier.size == 1 &&
              spark.catalog.tableExists(u.multipartIdentifier.head) =>
          // Nested analysis: the inner plan's own UnresolvedRelation now
          // resolves through the normal ResolveRelations path (the table
          // is registered), and the replay guard makes this rule a no-op
          // on re-entry.
          spark.table(u.multipartIdentifier.head).queryExecution.analyzed
      }
    }
  }
}
