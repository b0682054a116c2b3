package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: attribute a query's wall-clock to its Spark jobs and the
  * DRIVER-SIDE gaps between them. For each listed query it runs one
  * untimed warmup invocation, then one instrumented invocation that
  * prints, per job: start offset, duration, the gap since the previous
  * job ended (planning / file ops / state-store work / driver logic),
  * and the job's call site. The per-query sum of gaps vs job time says
  * whether to optimize the plan (job time) or the orchestration
  * (gaps). Usage: runMain graft.JobProbe <name>[,<name>...] [sfDir].
  */
object JobProbe {
  private val log = new java.io.PrintWriter(
    new java.io.FileWriter("/tmp/jobprobe.log", true), true)
  private def out(s: String): Unit = { println(s); log.println(s) }

  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q93_stream_attribution").split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional session-conf overrides for A/B experiments, e.g.
    // SPARK_GRAFT_PROBE_CONF="spark.sql.streaming.stateStore.providerClass=...".
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })

    final case class JobRec(
        id: Int, start: Long, var end: Long, site: String, desc: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[JobRec]()
    // SQL executions map 1:1 to DataFrame actions (with call sites);
    // AQE stage-materialization jobs carry no call site of their own.
    final case class ExecRec(id: Long, start: Long, var end: Long, desc: String)
    val execs = new java.util.concurrent.ConcurrentHashMap[Long, ExecRec]()
    val execOrder = new java.util.concurrent.ConcurrentLinkedQueue[ExecRec]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        val r = JobRec(js.jobId, js.time, -1L, site, desc)
        jobs.put(js.jobId, r); order.add(r)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = jobs.get(je.jobId); if (r != null) r.end = je.time
      }
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            val r = ExecRec(s.executionId, s.time, -1L, s.description)
            execs.put(s.executionId, r); execOrder.add(r)
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
            val r = execs.get(s.executionId); if (r != null) r.end = s.time
          case _ => ()
        }
    }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // untimed warmup: fixtures stage, codegen warms
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case scala.util.control.NonFatal(e) => println(s"[probe] warmup $name: $e") }
      jobs.clear(); order.clear(); execs.clear(); execOrder.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0n = System.nanoTime()
      val t0 = System.currentTimeMillis()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0n) / 1e9
      // listener bus is async; give it a beat to drain before reading
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val recs = order.asScala.toSeq.sortBy(_.start)
      out(f"%n[probe] ===== $name wall=${wall}%.3f s, ${recs.size} jobs =====")
      var prevEnd = t0
      var jobSum = 0L; var gapSum = 0L
      recs.foreach { r =>
        val end = if (r.end < 0) r.start else r.end
        val gap = math.max(0L, r.start - prevEnd)
        jobSum += (end - r.start); gapSum += gap
        out(f"[probe] +${(r.start - t0) / 1000.0}%7.3f gap=${gap / 1000.0}%6.3f dur=${(end - r.start) / 1000.0}%6.3f  ${r.site}%-40s ${r.desc.take(70)}")
        prevEnd = math.max(prevEnd, end)
      }
      val tail = math.max(0L, t0 + (wall * 1000).toLong - prevEnd)
      out(f"[probe] $name: jobs=${jobSum / 1000.0}%.3f s, gaps=${gapSum / 1000.0}%.3f s, tail=${tail / 1000.0}%.3f s")
      val erecs = execOrder.asScala.toSeq.sortBy(_.start)
      out(s"[probe] ----- ${erecs.size} SQL executions -----")
      var ePrev = t0
      erecs.foreach { r =>
        val end = if (r.end < 0) r.start else r.end
        val gap = math.max(0L, r.start - ePrev)
        out(f"[probe] +${(r.start - t0) / 1000.0}%7.3f egap=${gap / 1000.0}%6.3f edur=${(end - r.start) / 1000.0}%6.3f  ${r.desc.take(90)}")
        ePrev = math.max(ePrev, end)
      }
    }
    spark.stop()
  }
}
