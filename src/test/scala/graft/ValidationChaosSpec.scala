package graft

import org.apache.spark.sql.functions._

import graft.operators.Validation

/** Chaos loop for the one unexplained ScaleBench flake: a single
  * `SparkPlan.session() is null` NPE aborted the data-quality
  * validation stage once (identical binary re-ran clean — suspected
  * local-mode teardown/plan-reuse race). This spec re-executes the
  * same operator chain 50 times against the shared session, with
  * CONCURRENT collects every few rounds to stress the plan-session
  * wiring the NPE implicates. If the race is real it should trip here
  * eventually and the full stack is rethrown for diagnosis; 50 clean
  * loops are the recorded evidence that the flake is not a
  * deterministic code defect.
  */
class ValidationChaosSpec extends SparkSpec {

  test("validation stage survives 50 chaos loops (flake hunt)") {
    val n = 1000000L
    (1 to 50).foreach { round =>
      try {
        val df = spark.range(n).select(col("id"),
          when(col("id") % 1000 === 0, lit(null).cast("string"))
            .otherwise(lit("ok")).as("s"),
          when(col("id") % 100000 === 7, lit(-5.0))
            .otherwise((col("id") % 100).cast("double")).as("v"))
        val work = () => {
          val row = Validation.rowChecks(df, Seq(
              Validation.completeness("s"),
              Validation.inRange("v", 0.0, 99.0),
              Validation.minAtLeast("v", 0.0)))
            .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
          val uniq = Validation.uniqueKey(
            df.select((col("id") / 2).cast("long").as("k")), Seq("k"))
            .collect()(0)
          (row("completeness"), row("in_range"), row("min_at_least"),
            uniq.getLong(2), uniq.getLong(3))
        }
        val got =
          if (round % 5 == 0) {
            // concurrent execution of the same lazily-planned frames —
            // the shape most likely to expose a plan/session race
            import scala.concurrent.{Await, Future}
            import scala.concurrent.duration._
            import scala.concurrent.ExecutionContext.Implicits.global
            val fs = Seq.fill(3)(Future(work()))
            val rs = fs.map(Await.result(_, 5.minutes))
            assert(rs.distinct.size == 1)
            rs.head
          } else work()
        assert(got == ((999000L, 999990L, -500L, 500000L, 500000L)),
          s"round $round: planted counts off: $got")
      } catch {
        case e: Throwable =>
          val sw = new java.io.StringWriter()
          e.printStackTrace(new java.io.PrintWriter(sw))
          fail(s"chaos round $round reproduced a failure:\n$sw")
      }
    }
  }
}
