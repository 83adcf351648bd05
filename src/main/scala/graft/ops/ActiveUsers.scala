package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DAU / WAU / MAU + stickiness — the engagement report every product
  * warehouse ships daily: distinct actives per day, per ISO week, per
  * calendar month, and the DAU/MAU ratio ("how much of the monthly
  * audience shows up on a given day").
  *
  * Scale design: the data-scale shuffle happens ONCE — the
  * (day, user) distinct. Every coarser period derives from that
  * day-distinct set (a user is weekly-active iff day-active on some
  * day of the week), so the week and month dedups run over
  * day-grain rows, orders of magnitude below event grain. The final
  * assembly joins the per-day counts against week- and month-level
  * counts — calendar-scale frames that broadcast. Integer ppm
  * emissions via floor division (all counts positive — no
  * truncate-vs-floor trap).
  */
object ActiveUsers {

  /** One row per active day: `day, dau, wau, mau, dau_wau_ppm,
    * dau_mau_ppm` (the stickiness ratios).
    */
  def dauWauMau(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val du = events.select(to_date(ts).as("day"), user.as("__u"))
      .filter(col("day").isNotNull)
      .distinct()
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = du.select(trunc(col("day"), "week").as("__wk"), col("__u"))
      .distinct()
      .groupBy(col("__wk")).agg(count(lit(1)).as("wau"))
    val mau = du.select(trunc(col("day"), "month").as("__mo"), col("__u"))
      .distinct()
      .groupBy(col("__mo")).agg(count(lit(1)).as("mau"))
    dau
      .withColumn("__wk", trunc(col("day"), "week"))
      .withColumn("__mo", trunc(col("day"), "month"))
      .join(broadcast(wau), "__wk")
      .join(broadcast(mau), "__mo")
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        call_function("div", col("dau") * lit(1000000L), col("wau"))
          .as("dau_wau_ppm"),
        call_function("div", col("dau") * lit(1000000L), col("mau"))
          .as("dau_mau_ppm"))
  }
}
