package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Executed-plan introspection shared by specs and the demo (one walker,
  * not per-call-site copies that drift): collects what a plan actually
  * scans, descending through AQE's materialized plan and subqueries.
  */
object PlanWalk {

  /** Root paths of every file scan in the executed plan. */
  def scannedFiles(df: DataFrame): Seq[String] = {
    val found = scala.collection.mutable.Buffer[String]()
    def walk(p: SparkPlan): Unit = {
      p match {
        case f: FileSourceScanExec =>
          found ++= f.relation.location.rootPaths.map(_.toString)
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    found.toSeq
  }
}
