package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.table.KeyedTable

/** Workload-driven INDEX advisor — the index-family twin of [[MvAdvisor]]:
  * analyze a set of query frames, find the literal point probes over
  * registered keyed tables that [[PointLookupRewrite]] would serve if the
  * needed index sidecars existed, and recommend exactly those builds.
  * One matcher ([[PointLookupRewrite.probeShapes]]) is shared with the
  * serving rule, so the advisor can never recommend a shape the rule
  * later declines — the same one-matcher discipline the MV advisor keeps
  * with the MV rewrite.
  *
  * A probe the rule ALREADY serves drops out naturally: the served
  * plan's scan no longer roots at the registered path. Existing sidecars
  * are checked per recommendation (one driver `exists` each — advisor
  * context, not per-query planning).
  */
object IndexAdvisor {

  /** One index build: `kind` ∈ {"record_key", "secondary"}; `column` is
    * the probed column for a secondary recommendation, the key column
    * otherwise. `hits` counts workload probes this build serves.
    */
  final case class IndexRec(
      tablePath: String, kind: String, column: String, hits: Int)

  final case class IndexAdvice(
      recommendations: Seq[IndexRec], skipped: Seq[String])

  def analyze(spark: SparkSession, queries: Seq[DataFrame]): IndexAdvice = {
    val rule = new PointLookupRewrite(spark)
    val skipped = Seq.newBuilder[String]
    val shapes = queries.zipWithIndex.flatMap { case (q, i) =>
      // A poison frame (analysis exception on .optimizedPlan) lands in
      // skipped; it must never abort the whole analysis.
      try rule.probeShapes(q.queryExecution.optimizedPlan)
      catch {
        case scala.util.control.NonFatal(e) =>
          skipped += s"query #$i: ${e.getClass.getSimpleName}"; Nil
      }
    }
    val fs = new Path("/").getFileSystem(spark.sessionState.newHadoopConf())
    def exists(dir: String): Boolean =
      try fs.exists(new Path(dir)) catch { case _: Exception => false }
    // Every probe needs the record-level index (the candidate chain's
    // exact member); a non-key probe additionally needs the secondary
    // sidecar on its column. Recommend only what's absent.
    val wants = shapes.flatMap { m =>
      val rli = (m.spec.path, "record_key", m.spec.keyCols.head)
      if (m.viaKey) Seq(rli)
      else Seq(rli, (m.spec.path, "secondary", m.probeAttr.name))
    }
    val recs = wants.groupBy(identity).toSeq
      .map { case ((path, kind, col), hs) => IndexRec(path, kind, col, hs.length) }
      .filterNot { r =>
        val dir = kind2dir(r)
        exists(dir)
      }
      .sortBy(r => (-r.hits, r.tablePath, r.kind, r.column))
    IndexAdvice(recs, skipped.result())
  }

  private def kind2dir(r: IndexRec): String =
    if (r.kind == "record_key") s"${r.tablePath}/_graft_rli"
    else s"${r.tablePath}/_graft_si_${r.column}"

  /** Build every recommended index. The specs come from the registry the
    * workload's own reads warmed — the advisor never invents a table.
    * Returns a description line per build (for logs/tests).
    */
  def createRecommended(
      spark: SparkSession, advice: IndexAdvice): Seq[String] =
    advice.recommendations.flatMap { r =>
      val qualified = graft.table.MaterializedView.qualify(spark, r.tablePath)
      Option(KeyedTable.specRegistry.get(qualified)).map { spec =>
        val t = KeyedTable(spec)
        r.kind match {
          case "record_key" => t.recordKeyIndex(spark)
          case "secondary"  => t.secondaryIndex(spark, r.column)
        }
        s"${r.kind}(${r.column}) on ${r.tablePath} [${r.hits} probes]"
      }
    }
}
