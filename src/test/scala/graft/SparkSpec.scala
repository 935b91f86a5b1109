package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base for all graft specs (one JVM-wide session). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"

  /** Run `body` with a [[QueryExecutionListener]] capturing EVERY
    * executed plan it triggers, and hand the captured plan strings to
    * `check`. This is the assertion harness for operators with
    * driver-side actions inside (counted broadcast gates, collected
    * offsets, iterative fits): their interesting exchanges/joins never
    * appear in the RESULT's `finalPlan`, only in the intermediate
    * executions. Listener callbacks are async — polls until the plan
    * stream is stable for 3 ticks (10 s deadline).
    */
  def withCapturedPlans[A](body: => A)(check: List[String] => Unit): A = {
    import scala.collection.mutable
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val captured = mutable.Buffer.empty[String]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        captured.synchronized { captured += qe.executedPlan.toString }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val result = body
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var last = -1
      var stable = 0
      while (stable < 3 && System.nanoTime() < deadline) {
        val n = captured.synchronized(captured.size)
        if (n == last && n > 0) stable += 1 else stable = 0
        last = n
        Thread.sleep(100)
      }
      val plans = captured.synchronized(captured.toList)
      assert(plans.nonEmpty, "listener captured no executed plans")
      check(plans)
      result
    } finally spark.listenerManager.unregister(listener)
  }
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.local("graft-test", Some(4))
}
