package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

import graft.operators.Sessions

/** Bucketed gap sessionization: output-identical to the whole-key
  * window definition at every bucket width, correct across bucket
  * seams and empty buckets, and the event-relation window must
  * partition by (key, bucket) — never by key alone. */
class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  /** Whole-key window reference (fine at test scale; the operator
    * exists so production never runs this shape). */
  private def reference(ev: org.apache.spark.sql.DataFrame, gapSec: Long) = {
    val w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ev.withColumn("flag",
        when(lag(col("ts"), 1).over(w).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) >
            gapSec * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum("flag")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
  }

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1)) ->
      (r.getTimestamp(2), r.getTimestamp(3), r.getLong(4))).toMap

  test("output-identical to the window reference at every bucket " +
      "width, under a dominant key") {
    val rnd = new scala.util.Random(7)
    val ev = (1L to 600L).map { i =>
      val u = if (rnd.nextInt(10) == 0) s"u${rnd.nextInt(4)}" else "hot"
      (i, u, ts(rnd.nextInt(50000).toLong))
    }.toDF("event_id", "user_id", "ts")
    val expect = asMap(reference(ev, gapSec = 900L)
      .select("user_id", "session_id", "session_start", "session_end",
        "n_events"))
    // widths: many buckets, a few, and one so wide it degenerates to
    // a single bucket per key (the plain window form exactly)
    for (width <- Seq(600L, 7000L, 100000L)) {
      val got = asMap(Sessions.sessionize(ev, "user_id", "ts", "event_id",
        gapSeconds = 900L, bucketSeconds = width))
      assert(got == expect, s"width=$width")
    }
  }

  test("sessions chain across bucket seams and skip empty buckets") {
    // bucket width 100: one session crawling across 3 buckets (gaps
    // 60 <= 90), then a >gap jump over an entirely empty bucket
    val ev = Seq(
      (1L, "u", ts(80L)), (2L, "u", ts(140L)), (3L, "u", ts(200L)),
      (4L, "u", ts(260L)),
      (5L, "u", ts(600L)), (6L, "u", ts(650L)))
      .toDF("event_id", "user_id", "ts")
    val got = Sessions.sessionize(ev, "user_id", "ts", "event_id",
        gapSeconds = 90L, bucketSeconds = 100L)
      .orderBy("session_id").collect()
      .map(r => (r.getLong(1), r.getTimestamp(2), r.getTimestamp(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, ts(80L), ts(260L), 4L),
      (2L, ts(600L), ts(650L), 2L)), got.toSeq)
  }

  test("a gap exactly equal to gapSeconds does NOT split (strict >)") {
    val ev = Seq((1L, "u", ts(0L)), (2L, "u", ts(90L)), (3L, "u", ts(181L)))
      .toDF("event_id", "user_id", "ts")
    val got = Sessions.sessionize(ev, "user_id", "ts", "event_id",
        gapSeconds = 90L, bucketSeconds = 1000L)
      .orderBy("session_id").collect().map(r => (r.getLong(1), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 2L), (2L, 1L)), got.toSeq)
  }

  test("plan: the event-relation window partitions by (key, bucket)") {
    val ev = Seq((1L, "u", ts(0L))).toDF("event_id", "user_id", "ts")
    val p = Sessions.sessionize(ev, "user_id", "ts", "event_id",
        gapSeconds = 90L, bucketSeconds = 100L)
      .queryExecution.executedPlan.toString
    val winLines = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    // every window over the event relation carries the bucket column;
    // the only key-alone window runs on the bounded summary relation
    // (identified by its lag(last_tus) argument)
    assert(winLines.nonEmpty, p)
    winLines.foreach { l =>
      assert(l.contains("bucket") || l.contains("last_tus"),
        s"key-alone window over the event relation:\n$l\n$p")
    }
  }
}
