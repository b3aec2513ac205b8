package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based batch sessionization — the canonical clickstream rollup
  * (a new session starts when the time since the key's previous event
  * exceeds `gapSeconds`), built so that NO window ever partitions the
  * event relation by key alone.
  *
  * The textbook form — `lag(ts) over (partition by user order by ts)`
  * then a running sum of boundary flags — serializes each key's entire
  * timeline through one sort task: a bot/null-default key holding 10%
  * of a 100 TB log is a guaranteed straggler (the [[AsOf.joinAsOf]]
  * hot-key hazard, here made structural because EVERY row needs its
  * predecessor). This operator uses the [[AsOf.joinAsOfBucketed]]
  * discipline instead — two-level prefix computation:
  *
  *  1. WITHIN-BUCKET — events keyed by (key, bucket = ts div
  *     bucketSeconds): per-partition-bounded windows compute each
  *     event's boundary flag vs its in-bucket predecessor and the
  *     running count of in-bucket boundaries. A hot key spreads across
  *     its buckets.
  *  2. ACROSS BUCKETS — the per-(key, bucket) SUMMARY relation
  *     (first_ts, last_ts, internal-boundary count; one row per
  *     non-empty bucket) carries the cross-bucket state: a window by
  *     key over THIS bounded relation (rows per key <= time-range /
  *     bucketSeconds, independent of event volume) decides each
  *     bucket's first-event flag against the previous non-empty
  *     bucket's last_ts — empty buckets in between change nothing —
  *     and prefix-sums sessions started in earlier buckets.
  *  3. The summary joins back on (key, bucket) — the same shuffle key
  *     as step 1 — and each event's 1-based session ordinal is
  *     sessions_before_bucket + first_flag + in-bucket prefix.
  *
  * Determinism: in-bucket order is (ts, id); tied timestamps have zero
  * gap, so boundary flags — and therefore session ordinals — are
  * independent of how an engine breaks the tie.
  *
  * Output: one row per (key, session): (keyCol, session_id 1-based,
  * session_start, session_end, n_events).
  */
object Sessions {

  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 idCol: String, gapSeconds: Long,
                 bucketSeconds: Long): DataFrame = {
    require(gapSeconds >= 1 && bucketSeconds >= 1,
      s"bad spec: gap=$gapSeconds bucket=$bucketSeconds")
    val gapUs = gapSeconds * 1000000L
    val ev = events.select(col(keyCol).as("k"),
      unix_micros(col(tsCol).cast("timestamp")).as("tus"),
      col(tsCol).as("ts"), col(idCol).as("id"))
      .withColumn("bucket", floor(col("tus") / (bucketSeconds * 1000000L)))

    val wIn = Window.partitionBy("k", "bucket").orderBy("tus", "id")
    val flagged = ev
      .withColumn("prev", lag(col("tus"), 1).over(wIn))
      // first-in-bucket rows flag 0 here; their boundary is decided
      // on the summary relation (step 2)
      .withColumn("flag",
        when(col("prev").isNotNull && col("tus") - col("prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("pre", sum(col("flag"))
        .over(wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    val summary = flagged.groupBy("k", "bucket")
      .agg(min("tus").as("first_tus"), max("tus").as("last_tus"),
        sum("flag").as("internal"))
    val wAcross = Window.partitionBy("k").orderBy("bucket")
    val carried = summary
      .withColumn("prev_last", lag(col("last_tus"), 1).over(wAcross))
      .withColumn("first_flag",
        when(col("prev_last").isNull ||
          col("first_tus") - col("prev_last") > gapUs, 1L).otherwise(0L))
      .withColumn("before", coalesce(sum(col("internal") + col("first_flag"))
        .over(wAcross.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("k", "bucket", "first_flag", "before")

    flagged.join(carried, Seq("k", "bucket"))
      .withColumn("session_id",
        col("before") + col("first_flag") + col("pre"))
      .groupBy(col("k").as(keyCol), col("session_id"))
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
