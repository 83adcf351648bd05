package graft

/** Shared entry-point environment defaults — Bench and Verify must agree on
  * the session sizing or their numbers stop being comparable (round 2: a
  * fixed small default made the driver bench run local[4]).
  */
object Env {
  /** Core count for `local[N]` and `spark.sql.shuffle.partitions`: the
    * SPARK_GRAFT_CPUS override, else every host core (the driver contract
    * is local[32] and the driver does not export the override).
    */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    Runtime.getRuntime.availableProcessors().toString)
}
