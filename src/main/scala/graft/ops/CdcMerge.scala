package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch MERGE: apply a CDC changelog (insert/update/delete ops) to a
  * snapshot — the lakehouse `MERGE INTO` semantics as a pure-Spark
  * operator (reference class: the delete-insert K3 sink applies whole
  * partitions; this applies per-KEY changes).
  *
  * Per key, only the LATEST change matters, ordered by `(ts, event_id)`
  * — a total order. That latest row is found with a single `max(struct)`
  * aggregate (struct comparison is field-lexicographic, so `(us, eid)`
  * lead the ordering and the op/payload ride along) — partial-aggregated
  * map-side, ONE shuffle, no window/sort pass over the full changelog.
  * The snapshot then full-outer joins the per-key result (key-aligned
  * hash join — both sides shuffle on the key once; at warehouse scale
  * bucket both tables on the key and this is exchange-free):
  *
  *   - latest op = D            → row dropped (even for snapshot keys)
  *   - latest op = I/U          → changelog payload wins (upsert)
  *   - key untouched by changes → snapshot row passes through
  *
  * A delete for a key absent from the snapshot vanishes (idempotent
  * replay-safety: re-applying the same changelog yields the same table).
  */
object CdcMerge {

  /** One row per surviving key: `origin` ('snapshot' | 'changelog'),
    * `value_milli` (winning payload), `updated_us` (latest change time,
    * null for untouched snapshot keys).
    */
  def merge(snapshot: DataFrame, snapKey: Column, snapValueMilli: Column,
            changes: DataFrame, chgKey: Column, ts: Column,
            eventId: Column, op: Column,
            chgValueMilli: Column): DataFrame = {
    val kName = snapshot.select(snapKey).columns.head
    val latest = changes
      .select(chgKey.as("__k"),
        struct(unix_micros(ts).as("us"), eventId.as("eid"), op.as("op"),
          chgValueMilli.as("vm")).as("__s"))
      .groupBy("__k").agg(max("__s").as("__s"))
      .select(col("__k"), col("__s.us").as("__us"),
        col("__s.op").as("__op"), col("__s.vm").as("__vm"))
    snapshot.select(snapKey, snapValueMilli.as("__sv"))
      .join(latest, col(kName) === col("__k"), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(coalesce(col(kName), col("__k")).as(kName),
        when(col("__op").isNull, lit("snapshot")).otherwise(lit("changelog"))
          .as("origin"),
        coalesce(col("__vm"), col("__sv")).as("value_milli"),
        col("__us").as("updated_us"))
  }
}
