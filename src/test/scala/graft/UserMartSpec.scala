package graft

import org.apache.spark.sql.functions._
import graft.pipeline.UserMart

class UserMartSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val steps = Seq("signup", "view", "click", "purchase")

  private def mart = UserMart.user360(Tables.events(spark, dir),
    col("user_id"), col("ts"), col("event_id"), col("event_type"),
    expr("CAST(round(value * 1000) AS BIGINT)"), steps, gapSeconds = 86400,
    originDate = "2024-01-01", horizonTs = "2024-02-01 00:00:00")

  test("user360 equals the four standalone operators, per column") {
    val events = Tables.events(spark, dir)
    val m = mart.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4), r.getLong(5)))
      .toMap

    val sessions = graft.ops.Sessionize.sessions(events, col("user_id"),
        col("ts"), gapSeconds = 86400)
      .groupBy("user_id").agg(max("session_seq").as("n"))
      .as[(Long, Long)].collect().toMap
    val twap = graft.ops.Scd2.timeWeightedMean(events, col("user_id"),
        col("ts"), col("event_id"),
        expr("CAST(round(value * 1000) AS BIGINT)"),
        horizonTs = "2024-02-01 00:00:00")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val cohort = events.groupBy("user_id")
      .agg(min(datediff(to_date(col("ts")), lit("2024-01-01")).cast("long"))
        .as("c")).as[(Long, Long)].collect().toMap
    // per-user funnel stage via the Funnel fold's own building blocks:
    // count users reaching >= k per the conversion op, then recheck each
    // user's mart stage against membership in the step-k survivor sets
    val conv = graft.ops.Funnel.conversion(events, col("user_id"), col("ts"),
        col("event_type"), steps)
      .select("step_idx", "n_keys").as[(Int, Long)].collect().toMap

    assert(m.nonEmpty)
    m.foreach { case (u, (cohortDay, nSessions, _, heldUs, twapMilli)) =>
      assert(nSessions == sessions(u), s"user $u sessions")
      assert((heldUs, twapMilli) == twap(u), s"user $u twap")
      assert(cohortDay == cohort(u), s"user $u cohort")
    }
    // funnel: the mart's stage histogram must reproduce the op's counts
    val hist = m.values.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    steps.indices.foreach { i =>
      val reached = hist.filter(_._1 >= i + 1).values.sum
      assert(reached == conv(i + 1), s"stage >= ${i + 1} count")
    }
  }

  test("user360 costs exactly one event-scale hash exchange") {
    spark.conf.set("spark.graft.parallelizeInputs", "false")
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = mart.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges in:\n$p")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.graft.parallelizeInputs", "true")
    }
  }
}
