package graft

/** Dev tool: serve-ENGAGEMENT audit — for each named query, report the
  * scan granularity of every parquet relation in its optimized plan
  * (file-granular roots = an index/stats rule swapped the scan;
  * `dir` = declarative table-directory scan; `local` = the plan folded
  * to driver-resident rows, the aggregate serves' shape). A
  * serve-subject query whose ONLY root is its own table directory is a
  * rule matching in specs but declining on the real fixture — the q192
  * failure mode round 17 uncovered: correct, invisible to the oracle,
  * and paying the full scan at bench scale.
  * Usage: runMain graft.AuditServe <sfDir> <name>[,<name>...]
  */
object AuditServe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args(1).split(',').toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        try {
          val df = fn(spark, sfDir)
          val opt = df.queryExecution.optimizedPlan
          val scans = opt.collect {
            case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              l.relation match {
                case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  val roots = h.location.rootPaths
                  val granular = roots.forall(_.getName.endsWith(".parquet"))
                  val tag = roots.headOption
                    .map(_.toString.split('/').takeRight(2).head)
                    .getOrElse("?")
                  if (granular) s"files:${roots.length}($tag)" else s"dir($tag)"
                case _ => "other"
              }
          }
          val locals = opt.collect {
            case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => 1
          }.sum
          println(s"[audit] $name -> scans=${scans.mkString(", ")}" +
            (if (locals > 0) s" local=$locals" else ""))
        } catch {
          case scala.util.control.NonFatal(e) =>
            println(s"[audit] $name -> error ${e.getClass.getSimpleName}")
        }
      }
    }
    spark.stop()
  }
}
