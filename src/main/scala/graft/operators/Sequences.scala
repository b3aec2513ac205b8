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

  /** Event-time tick (microseconds for timestamps, the raw value for
    * integral columns) — the [[Sessions.sessionize]] bucketing axis. */
  private def tick(df: DataFrame, c: String): Column =
    if (df.schema(c).dataType ==
        org.apache.spark.sql.types.TimestampType) unix_micros(col(c))
    else col(c).cast("long")

  /** [[nextEventExamples]] with the [[AsOf.joinAsOfBucketed]] /
    * [[Sessions.sessionize]] hot-key posture — OUTPUT-IDENTICAL, but
    * every window over the EVENT relation partitions by (key,
    * time-bucket), so a dominant key's timeline spreads over
    * `span / bucketSeconds` tasks instead of serializing through one
    * sort task.
    *
    * Two-level plan: (1) in-bucket context via the same bounded ROWS
    * frame, scoped to (key, bucket); (2) cross-bucket carry — each
    * (key, bucket)'s LAST `contextLen` targets (one bounded row per
    * occupied bucket) windowed by key over that SUMMARY relation,
    * whose per-key row count is span/bucketSeconds, independent of
    * event volume. A row's context is the last `contextLen` of
    * (carry ++ in-bucket-preceding); since every non-empty bucket
    * contributes >= 1 event, the carry needs at most the
    * `contextLen` previous occupied buckets — a bounded frame there
    * too. NULL keys group together (window semantics), so the
    * carry join is null-safe. */
  def nextEventExamplesBucketed(events: DataFrame, keyCol: String,
      tsCol: String, idCol: String, targetCol: String, contextLen: Int,
      bucketSeconds: Long): DataFrame = {
    require(contextLen >= 1, s"contextLen must be >= 1: $contextLen")
    require(bucketSeconds >= 1, s"bad bucketSeconds: $bucketSeconds")
    val bucketUs = bucketSeconds * 1000000L
    val ev = events.withColumn("__tus", tick(events, tsCol))
      .withColumn("__bucket", floor(col("__tus") / bucketUs))
    val wIn = Window.partitionBy(col(keyCol), col("__bucket"))
      .orderBy(col(tsCol), col(idCol))
    // level 1: in-bucket preceding targets (bounded frame) + each
    // row's in-bucket ordinal so the bucket tail row is identifiable
    val flagged = ev
      .withColumn("__inb",
        collect_list(col(targetCol)).over(wIn.rowsBetween(-contextLen, -1)))
      .withColumn("__lastk",
        collect_list(col(targetCol))
          .over(wIn.rowsBetween(1 - contextLen, 0)))
      .withColumn("__rn", row_number().over(wIn))
      .withColumn("__cnt",
        count(lit(1)).over(wIn.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    // level 2: one bounded row per occupied (key, bucket) — its last
    // contextLen targets; the carry into a bucket is the flattened
    // tail of its <= contextLen previous occupied buckets
    val summary = flagged.filter(col("__rn") === col("__cnt"))
      .select(col(keyCol), col("__bucket"), col("__lastk"))
    val wAcross = Window.partitionBy(col(keyCol)).orderBy(col("__bucket"))
    val carried = summary
      .withColumn("__flat", flatten(collect_list(col("__lastk"))
        .over(wAcross.rowsBetween(-contextLen, -1))))
      .withColumn("__carry",
        when(size(col("__flat")) > contextLen,
          slice(col("__flat"),
            size(col("__flat")) - lit(contextLen - 1), lit(contextLen)))
          .otherwise(col("__flat")))
      .select(col(keyCol).as("__ck"), col("__bucket").as("__cb"),
        col("__carry"))
    // both legs null-safe: a NULL event-time yields a NULL __bucket,
    // which the windows group together but a plain === would never
    // match — silently dropping those rows' carry and breaking the
    // documented output-identity with the plain key-window form
    val joined = flagged.join(carried,
      col(keyCol) <=> col("__ck") && col("__bucket") <=> col("__cb"),
      "left")
    val full = concat(
      coalesce(col("__carry"),
        array().cast(org.apache.spark.sql.types.ArrayType(
          events.schema(targetCol).dataType))),
      col("__inb"))
    joined
      .withColumn("context",
        when(size(full) > contextLen,
          slice(full, size(full) - lit(contextLen - 1), lit(contextLen)))
          .otherwise(full))
      .filter(size(col("context")) >= 1)
      .select(col(keyCol), col(idCol).as("target_id"), col(tsCol),
        col("context"), size(col("context")).as("n_context"),
        col(targetCol).as("target"))
  }

  /** Per-event NEXT-event attach — `lead(1)` over (key, ts, id) —
    * with the same bucketed hot-key posture: for each event, the
    * values of `carryCols` at the key's next event (NULLs at the
    * key's last event). The in-bucket `lead` covers every row except
    * each bucket's LAST, whose successor is the FIRST row of the
    * key's next occupied bucket — carried through the bounded
    * (key, bucket) summary relation exactly like
    * [[nextEventExamplesBucketed]]'s context carry. This is the
    * building block `churn_labels` (next_ts gap) and
    * `event_transitions` (next event_type) need, made skew-proof. */
  def nextEventBucketed(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, carryCols: Seq[String],
      bucketSeconds: Long): DataFrame = {
    require(carryCols.nonEmpty, "no carry columns requested")
    require(bucketSeconds >= 1, s"bad bucketSeconds: $bucketSeconds")
    val bucketUs = bucketSeconds * 1000000L
    val ev = events.withColumn("__tus", tick(events, tsCol))
      .withColumn("__bucket", floor(col("__tus") / bucketUs))
    val wIn = Window.partitionBy(col(keyCol), col("__bucket"))
      .orderBy(col(tsCol), col(idCol))
    val payload = struct(carryCols.map(col): _*)
    val flagged = ev
      .withColumn("__next_in", lead(payload, 1).over(wIn))
      .withColumn("__rn", row_number().over(wIn))
      .withColumn("__cnt",
        count(lit(1)).over(wIn.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    // one bounded row per occupied (key, bucket): its FIRST payload;
    // lead(1) by key over the summary gives each bucket the first
    // payload of the key's next occupied bucket
    val wAcross = Window.partitionBy(col(keyCol)).orderBy(col("__bucket"))
    val summary = flagged.filter(col("__rn") === 1)
      .select(col(keyCol), col("__bucket"), payload.as("__first"))
      .withColumn("__next_bucket_first", lead(col("__first"), 1).over(wAcross))
      .select(col(keyCol).as("__ck"), col("__bucket").as("__cb"),
        col("__next_bucket_first"))
    // null-safe on both legs (NULL ts → NULL __bucket; see above)
    val joined = flagged.join(summary,
      col(keyCol) <=> col("__ck") && col("__bucket") <=> col("__cb"),
      "left")
      .withColumn("__next",
        when(col("__rn") === col("__cnt"), col("__next_bucket_first"))
          .otherwise(col("__next_in")))
    joined.select(ev.columns.toIndexedSeq
      .filterNot(_.startsWith("__")).map(col) ++
      carryCols.map(c => col(s"__next.$c").as(s"next_$c")): _*)
  }
}
