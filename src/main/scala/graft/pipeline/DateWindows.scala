package graft.pipeline

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** The reference's run-date arithmetic (`script/main.py:196-247`): from the
  * job arguments `partition_date` (a date or the literal `yesterday`) and
  * `days_ago` (a day count or the literal `full_refresh`), derive the four
  * date anchors every downstream predicate uses.
  *
  * Subtleties pinned by spec (all reference-faithful):
  *  - the look-back subtracts `days_ago` from the FIRST of the partition
  *    month, not from the partition date itself;
  *  - `full_refresh` pins the look-back start to the oldest date available
  *    in the data (the reference hard-codes its ingest epoch);
  *  - both catalog predicates are CLOSED intervals ending at the partition
  *    date (`>= start and <= partition_date`).
  */
final case class DateWindows(
    firstDayCurrentMonth: String,
    partitionDate: String,
    firstDayPast: String,
    partitionMonth: String) {

  /** Partition predicate for the look-back sources (reference
    * `script/main.py:263-284`: red_red_text / red_ecd_raw) — pass to
    * [[graft.io.Sources.table]] for metadata-only pruning.
    */
  def lookbackPredicate(partitionCol: String): String =
    s"($partitionCol >= date'$firstDayPast' and $partitionCol <= date'$partitionDate')"

  /** Partition predicate for the current-month counter sources (reference
    * `script/main.py:286-298`: the two kinesis daily tables).
    */
  def currentMonthPredicate(partitionCol: String): String =
    s"($partitionCol >= date'$firstDayCurrentMonth' and $partitionCol <= date'$partitionDate')"
}

object DateWindows {

  /** The reference's "oldest date available in the data"
    * (`script/main.py:204`) — the full-refresh look-back start.
    */
  val fullRefreshEpoch = "2024-05-20"

  /** @param partitionDate ISO date or `"yesterday"`.
    * @param daysAgo       integer day count or `"full_refresh"`.
    * @param today         injectable clock for `"yesterday"` (tests pin it).
    *                      The default reads UTC — every session in this
    *                      library pins `spark.sql.session.timeZone=UTC`, and
    *                      a host-zone `now()` would resolve to the wrong day
    *                      near midnight on non-UTC hosts.
    */
  def resolve(partitionDate: String, daysAgo: String,
              today: LocalDate = LocalDate.now(java.time.ZoneOffset.UTC)): DateWindows = {
    val pd =
      if (partitionDate == "yesterday") today.minusDays(1)
      else LocalDate.parse(partitionDate)
    val firstOfMonth = pd.withDayOfMonth(1)
    val firstDayPast =
      if (daysAgo == "full_refresh") LocalDate.parse(fullRefreshEpoch)
      else firstOfMonth.minusDays(daysAgo.toInt)
    DateWindows(
      firstDayCurrentMonth = firstOfMonth.toString,
      partitionDate = pd.toString,
      firstDayPast = firstDayPast.toString,
      partitionMonth = pd.format(DateTimeFormatter.ofPattern("yyyy-MM")))
  }

  /** Export-path date key (`script/main.py:240,377-393`): the literal
    * `full_refresh` when `days_ago` says so, else the resolved partition
    * date — the reference keys every per-iteration file export by this
    * segment (`partitioncreateddate=…`).
    */
  def exportSegment(partitionDate: String, daysAgo: String,
                    today: LocalDate = LocalDate.now(java.time.ZoneOffset.UTC)): String =
    if (daysAgo == "full_refresh") "full_refresh"
    else resolve(partitionDate, daysAgo, today).partitionDate

  /** Map the run anchors onto [[ConsumeParams]]' windows: the price-history
    * month is [first of month, day after partition date) and the activity
    * window is the look-back interval (half-open on the same day-after end,
    * equivalent to the reference's closed `<= partition_date` on date-grained
    * data).
    */
  def toParams(dw: DateWindows,
               iterations: Seq[IterationSpec]): ConsumeParams = {
    val dayAfter = LocalDate.parse(dw.partitionDate).plusDays(1).toString
    ConsumeParams(
      activityFrom = dw.firstDayPast,
      activityTo = dayAfter,
      monthStart = dw.firstDayCurrentMonth,
      monthEnd = dayAfter,
      iterations = iterations)
  }
}
