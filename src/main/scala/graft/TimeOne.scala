package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time registered queries (default 2 runs each — cold, warm)
  * against a fixture dir. A COMMA-SEPARATED list interleaves the whole
  * list per pass (q95,q94,q95 = the A/B/A discipline for isolating
  * session interference from real regressions).
  * Usage: runMain graft.TimeOne <name>[,<name>...] [sfDir].
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q41_knn_join").split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { i =>
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"[timeone] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
