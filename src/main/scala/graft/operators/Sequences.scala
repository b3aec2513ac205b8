package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-dataset construction from event logs — the
  * "user history → next event" examples a sequential recommender or
  * behavioral LM trains on: for every event, the chronologically
  * ordered context of up to `contextLen` PRECEDING events of the same
  * key, paired with the event as the prediction target.
  *
  * Scale posture: one shuffle keyed on the sequence key; the window
  * frame is ROWS BETWEEN contextLen PRECEDING AND 1 PRECEDING, so
  * state per row is bounded by `contextLen` regardless of history
  * length. Like [[AsOf.joinAsOf]], the window partitions by key only —
  * a degenerate key holding a large share of all events (a bot, a null
  * default) serializes its timeline through one sort task; shard such
  * keys upstream (salt by session/day) or pre-filter them, exactly the
  * [[AsOf.joinAsOfBucketed]] rationale. Typical per-user event counts
  * make the plain form the right default.
  */
object Sequences {

  /** @param keyCol     sequence key (user id)
    * @param tsCol      event-time column; (ts, idCol) must be unique
    *                   per key — idCol breaks ts ties deterministically
    * @param idCol      unique event id (tie-break + target id)
    * @param targetCol  the value being predicted (e.g. event_type)
    * @param contextLen max context events per example
    *
    * Output: (key, target_id, ts, context ARRAY — oldest first,
    * n_context, target); events with NO preceding context are dropped
    * (nothing to condition on). */
  def nextEventExamples(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, targetCol: String, contextLen: Int): DataFrame = {
    require(contextLen >= 1, s"contextLen must be >= 1: $contextLen")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-contextLen, -1)
    events
      .withColumn("context", collect_list(col(targetCol)).over(w))
      .filter(size(col("context")) >= 1)
      .select(col(keyCol), col(idCol).as("target_id"), col(tsCol),
        col("context"), size(col("context")).as("n_context"),
        col(targetCol).as("target"))
  }
}
