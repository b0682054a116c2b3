package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump formatted physical plans for the registered queries —
  * the per-operator audit loop (is the filter pushed, is the dim
  * broadcast, how wide are the WholeStageCodegen spans?).
  *
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_EXPLAIN_DIR=<dir>[:<suffix>] additionally writes each
    // plan to <dir>/<query><suffix>.txt — the committed plan-evidence
    // format (plans/rNN/<query>_before.txt / _after.txt).
    val sink = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR").map { v =>
      val (d, suf) = v.split(":", 2) match {
        case Array(d, s) => (d, s); case Array(d) => (d, "")
      }
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      (d, suf)
    }
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        println(s"\n===== $name =====")
        try {
          val plan = fn(spark, sfDir).queryExecution
            .explainString(ExplainMode.fromString("formatted"))
          println(plan)
          sink.foreach { case (d, suf) =>
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(d, s"$name$suf.txt"), plan)
          }
        } catch { case e: Throwable => println(s"explain failed: $e") }
      }
    }
    spark.stop()
  }
}
