package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** [[Multimodal.phashNearDup]]: the 4-chunk pigeonhole candidate stage
  * must be an EXACT superset at every τ ≤ 3 (a pair differing in ≤ 3 of
  * 56 bits cannot touch all four 14-bit chunks), and the plan must stay
  * join-shaped — no cartesian/broadcast-nested-loop anywhere.
  */
class PhashSpec extends SparkTestBase {
  import spark.implicits._

  private def bruteForce(maxHamming: Int): Set[(Long, Long, Int)] = {
    val hashes = Multimodal.imagePhash(spark, sf0001)
      .select("doc_id", "phash").as[(Long, Long)].collect()
    (for {
      (a, pa) <- hashes; (b, pb) <- hashes if a < b
      h = java.lang.Long.bitCount(pa ^ pb) if h <= maxHamming
    } yield (a, b, h)).toSet
  }

  test("pigeonhole pairs equal brute force at tau = 1 and tau = 3") {
    for (tau <- Seq(1, 3)) {
      val got = Multimodal.phashNearDup(spark, sf0001, tau)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == bruteForce(tau), s"tau=$tau mismatch")
    }
  }

  test("the candidate plan is join-shaped: no cartesian, no nested loop") {
    val df = Multimodal.phashNearDup(spark, sf0001)
    df.write.mode("overwrite").format("noop").save() // finalize AQE
    val bad = scala.collection.mutable.Buffer[String]()
    def walk(p: SparkPlan): Unit = {
      p match {
        case c: CartesianProductExec => bad += c.nodeName
        case n: BroadcastNestedLoopJoinExec => bad += n.nodeName
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ =>
      }
      p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    assert(bad.isEmpty, s"non-keyed joins in plan: $bad")
  }
}
