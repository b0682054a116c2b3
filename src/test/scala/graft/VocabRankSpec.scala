package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** The vocabulary-rank family (q80/q84/q87) must never funnel the whole
  * distinct-term domain through a single task: the top-`vocabSize`
  * selection is the bounded-heap [[graft.functions.TopTermsByCount]]
  * aggregate, not a partition-less `row_number()` window (which Spark
  * executes on ONE partition — a scale-killer once the term domain follows
  * Heaps' law). These specs pin both the plan shape and the rank
  * equivalence against an inline window-based reference.
  */
class VocabRankSpec extends SparkTestBase {

  private def partitionlessWindows(df: DataFrame): Seq[String] = {
    val found = scala.collection.mutable.Buffer[String]()
    def walk(p: SparkPlan): Unit = {
      p match {
        case w: WindowExec if w.partitionSpec.isEmpty => found += w.simpleStringWithNodeId()
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    found.toSeq
  }

  test("q80/q84/q87/q127 plans contain no partition-less WindowExec") {
    val plans = Seq(
      "tokenIds" -> TextAnalysis.tokenIds(spark, sf0001),
      "cooccurrence" -> TextAnalysis.cooccurrence(spark, sf0001),
      "oovStats" -> TextAnalysis.oovStats(spark, sf0001),
      "bpePairs" -> TextAnalysis.bpePairs(spark, sf0001))
    plans.foreach { case (name, df) =>
      val bad = partitionlessWindows(df)
      assert(bad.isEmpty, s"$name has partition-less windows: ${bad.mkString("; ")}")
    }
  }

  test("bounded-heap vocabulary matches the window-rank reference exactly") {
    import graft.functions.TopTermsByCount.topTermsByCount
    val counts = graft.sources.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    val viaAgg = counts
      .agg(topTermsByCount(col("n"), col("term"), 20).as("v"))
      .select(posexplode(col("v")))
      .select(col("col.term").as("term"), col("col.n").as("n"),
        (col("pos") + 1).as("r"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    val viaWindow = counts
      .withColumn("r", row_number().over(Window.orderBy(col("n").desc, col("term"))))
      .filter(col("r") <= 20)
      .orderBy("r")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(viaAgg == viaWindow)
  }

  test("bounded-heap aggregate merges partial buffers across many partitions") {
    import graft.functions.TopTermsByCount.topTermsByCount
    import spark.implicits._
    // ties on count resolve term-asc; k smaller than domain; skewed counts
    val df = (1 to 500).map(i => (s"t${i % 37}", 1)).toDF("term", "one")
      .repartition(16)
      .groupBy("term").agg(count(lit(1)).as("n"))
    val top = df.agg(topTermsByCount(col("n"), col("term"), 5).as("v"))
      .select(posexplode(col("v"))).select(col("col.term"), col("col.n"))
      .as[(String, Long)].collect().toSeq
    val expected = (0 until 37).map(i => (s"t$i", (1 to 500).count(_ % 37 == i).toLong))
      .sortBy { case (t, n) => (-n, t) }.take(5)
    assert(top == expected)
  }
}
