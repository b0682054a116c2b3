package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: exercise scan + broadcast join + aggregate + noop
    // sink once so the first timed query doesn't absorb JVM classloading
    // and whole-stage-codegen compiler cold start.
    try SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    catch { case scala.util.control.NonFatal(_) => () } // fatal VM errors must abort, not skew
    // Median of `reps` INTERLEAVED whole-suite passes: the VM's throughput
    // swings ~2× in multi-second windows, so back-to-back reps of one query
    // all land inside the same throttle window and the per-query median
    // can't defend. Running the full suite per pass separates a query's
    // samples by minutes; a throttle poisons at most one sample of each
    // query, which the cross-pass median discards.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // Optional subset for local iteration (comma-separated query names);
    // the driver never sets it, so driver runs always cover the suite.
    val names = {
      val all = SparkEntry.queries.keys.toSeq
      sys.env.get("SPARK_GRAFT_BENCH_ONLY")
        .map(only => all.filter(only.split(',').toSet))
        .getOrElse(all)
    }
    // The streaming-state family pays a first-run state-store/provider
    // class-init cost that is a JVM artifact, not plan cost (q117 read
    // 7.8 s in r10 from exactly this: a cold 9.4 s sample plus one VM
    // throttle defeats the cross-pass median). ONE untimed warmup per
    // such query removes the systematic cold sample, so the median only
    // has to defend against genuine throttles. Override the family with
    // SPARK_GRAFT_BENCH_WARM=name,name (empty string disables).
    val warmNames = sys.env.get("SPARK_GRAFT_BENCH_WARM")
      .map(_.split(',').toSeq.filter(_.nonEmpty))
      .getOrElse(names.filter(n => n.contains("stream") || n.contains("cdc")))
    warmNames.filter(names.contains).foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case scala.util.control.NonFatal(_) => () } // fatal VM errors must abort, not skew
    }
    val samples = scala.collection.mutable.Map
      .empty[String, List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to reps; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      // noop sink: materializes every output column (count() would let
      // Catalyst prune projection work), measuring the real plan cost.
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] $name: $e")
      }
      samples(name) = ((System.nanoTime() - t0) / 1e9) :: samples(name)
    }
    val results = names.map { name =>
      val times = samples(name).sorted
      name -> times(times.length / 2)
    }.toMap
    // Per-query MIN across passes, alongside the median: min is the
    // noise-robust statistic for wall-clock (every slowdown source —
    // VM throttle, GC, cold state — only ever ADDS time), so
    // round-over-round regression diffs read the min; the median stays
    // the headline (the driver's total sums it).
    val mins = names.map(name => name -> samples(name).min).toMap
    // 3-decimal rounding halves the line, and emitting it both before and
    // after shutdown guarantees the driver's bounded tail capture contains
    // at least one complete copy (r03's single long line was truncated
    // mid-JSON by the tail window).
    def r3(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Short total-only line LAST: the driver's bounded tail capture truncated
    // the single long per-query line (94 queries) before reaching the
    // "metric" field in r05, recording parsed:null. A compact final line is
    // always inside any tail window; the long per-query line stays above it
    // for humans and logs.
    val totalLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size}}"""
    // Full per-query map ALSO lands in a file: the driver's bounded tail
    // capture recovers only part of the long stdout line (75/141 in r10),
    // so round-over-round per-query regression tracking reads this file
    // instead of a truncated tail.
    val fullPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "bench_full.json"))
      .toAbsolutePath
    // The file carries the per-query statistics ({"median":…,"min":…})
    // PLUS the raw per-pass samples in chronological order ("passes"):
    // a drifted host draw is then provable from the artifact itself —
    // e.g. pass 2 of every query reading 2× pass 3 is weather, one
    // query's all-passes regression is code — instead of reconstructed
    // from git. The stdout line keeps the flat median map the driver
    // parses.
    val qsFull = names.map { name =>
      val passes = samples(name).reverse.map(r3).mkString("[", ",", "]")
      s"\"" + name + "\":{\"median\":" + r3(results(name)) +
        ",\"min\":" + r3(mins(name)) + ",\"passes\":" + passes + "}"
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(fullPath,
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qsFull,"sf":"$sfDir"}""" + "\n")
    println(line)
    spark.stop()
    println(line)
    println(s"""{"bench_full":"$fullPath"}""")
    println(totalLine)
  }
}
