package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.table.MaterializedView

/** Dev tool: MV lifecycle cost rows for BASELINE §3 — build, attach,
  * append-delta refresh vs rebuild, and served-vs-direct aggregate, at a
  * given tier. The build scans the base once (that cost is q128's bench
  * row); everything after is what a long-lived serving layer pays:
  * attach is sidecar-read metadata, an append refresh scales with the
  * DELTA (one part file here), a rebuild re-scans the base — their gap
  * is the table/delta ratio the incremental path exists for.
  *
  * Usage: runMain graft.MvSmoke [sfDir]
  */
object MvSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = Sessions.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Private dir-shaped copy of orders so the appends don't touch the
    // fixture (handles both the shipped single-file and generated-dir
    // layouts).
    val work = Files.createTempDirectory("graft_mvsmoke_")
    val base = work.resolve("orders.parquet")
    Files.createDirectories(base)
    val src = Paths.get(dir, "orders.parquet")
    val parts =
      if (Files.isDirectory(src))
        Files.list(src).filter(_.toString.endsWith(".parquet"))
          .toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
      else Seq(src)
    parts.zipWithIndex.foreach { case (p, i) =>
      Files.copy(p, base.resolve(f"part-$i%05d.snappy.parquet"),
        StandardCopyOption.COPY_ATTRIBUTES)
    }
    val basePath = base.toString
    val mvPath = work.resolve("mv").toString

    def timed(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[mvsmoke] $label%-16s $s%8.3f s")
      s
    }

    def query() = spark.read.parquet(basePath)
      .filter(col("o_orderstatus") === "O")
      .groupBy(col("o_orderpriority"))
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double")
        .as("sum_price"), count(lit(1)).as("n_orders"))

    // Untimed warmup: JVM classloading + codegen cold start otherwise
    // lands entirely inside the first timed row.
    query().write.mode("overwrite").format("noop").save()
    spark.range(10).write.mode("overwrite")
      .parquet(work.resolve("warm").toString)

    timed("direct_agg") { query().write.mode("overwrite").format("noop").save() }
    timed("create") {
      MaterializedView.create(
        spark, "smoke", basePath, mvPath,
        groupCols = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("sum_price_d" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      ()
    }
    timed("served_agg") { query().write.mode("overwrite").format("noop").save() }
    MaterializedView.drop(basePath)
    timed("attach") { MaterializedView.attach(spark, mvPath); () }
    // Append ONE part file (the nightly-delta shape at file granularity).
    Thread.sleep(1100) // local-fs mtime can be second-granular
    Files.copy(base.resolve("part-00000.snappy.parquet"),
      base.resolve("part-appended.snappy.parquet"))
    timed("refresh_append") {
      val (_, inc) = MaterializedView.refresh(spark, mvPath)
      require(inc, "append must take the incremental path")
    }
    // Touch a recorded file: non-append → rebuild.
    Thread.sleep(1100)
    Files.setLastModifiedTime(base.resolve("part-00000.snappy.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    timed("refresh_rebuild") {
      val (_, inc) = MaterializedView.refresh(spark, mvPath)
      require(!inc, "a touched file must force the rebuild path")
    }
    MaterializedView.drop(basePath)
    spark.stop()
  }
}
