package graft

/** Whole-surface anti-pattern sweep: every driver-contract query must plan
  * without the two unconditional scale-killers — a CartesianProduct (the
  * documented probe×corpus baselines broadcast, which plans a
  * BroadcastNestedLoopJoin, never a cartesian shuffle) and any Python/
  * external-eval operator. One spec instead of 52: a new query can't ship
  * with either by accident.
  */
class PlanSweepSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("no query plans a CartesianProduct or external UDF eval") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val p = q(spark, sf).queryExecution.executedPlan.toString
        Seq("CartesianProduct", "BatchEvalPython", "ArrowEvalPython")
          .filter(p.contains).map(bad => s"$name -> $bad")
    }
    assert(offenders.isEmpty, s"scale-killer operators found:\n${offenders.mkString("\n")}")
  }
}
