package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Sequences

/** Sequence-dataset construction: context ordering, frame bounds,
  * ts tie-breaks, and the no-context drop rule. */
class SequencesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("golden: oldest-first contexts bounded by contextLen; " +
      "no-context events dropped; keys isolated") {
    val ev = Seq(
      (1L, "u1", ts(10), "view"),
      (2L, "u1", ts(20), "click"),
      (3L, "u1", ts(30), "view"),
      (4L, "u1", ts(40), "purchase"),
      (5L, "u1", ts(50), "view"),
      (6L, "u2", ts(15), "error")) // sole event: no context -> dropped
      .toDF("event_id", "user_id", "ets", "event_type")
    val got = Sequences.nextEventExamples(ev, "user_id", "ets",
        "event_id", "event_type", contextLen = 3)
      .collect().map(r => r.getLong(1) ->
        (r.getSeq[String](3), r.getInt(4), r.getString(5))).toMap
    assert(got.keySet === Set(2L, 3L, 4L, 5L))
    assert(got(2L) === ((Seq("view"), 1, "click")))
    assert(got(3L) === ((Seq("view", "click"), 2, "view")))
    assert(got(4L) === ((Seq("view", "click", "view"), 3, "purchase")))
    // frame caps at 3: event 1 ages out of event 5's context
    assert(got(5L) === ((Seq("click", "view", "purchase"), 3, "view")))
  }

  test("equal timestamps break ties by event id, deterministically") {
    val ev = Seq(
      (7L, "u", ts(10), "a"),
      (8L, "u", ts(10), "b"), // same ts as 7 -> 7 precedes (lower id)
      (9L, "u", ts(20), "c"))
      .toDF("event_id", "user_id", "ets", "event_type")
    val got = Sequences.nextEventExamples(ev, "user_id", "ets",
        "event_id", "event_type", contextLen = 5)
      .collect().map(r => r.getLong(1) -> r.getSeq[String](3)).toMap
    assert(got(8L) === Seq("a"))
    assert(got(9L) === Seq("a", "b"))
  }

  /** Skewed fixture: one dominant key holding most events across many
    * buckets (contexts must flow across every bucket boundary), a
    * sparse key with EMPTY buckets in between (carry must look past
    * them), a NULL key (window semantics group NULLs together), tied
    * timestamps at a bucket boundary, and a single-event key. */
  private def skewedFixture = {
    val dominant = (0 until 400).map { i =>
      (i.toLong, "hot", ts(10L + i * 37), s"t${i % 5}")
    }
    val sparse = Seq(
      (1000L, "cold", ts(5), "x"), (1001L, "cold", ts(905), "y"),
      (1002L, "cold", ts(9005), "z")) // buckets 0, 9, 90: gaps of 8+
    val nulls = Seq(
      (2000L, null, ts(50), "n1"), (2001L, null, ts(150), "n2"),
      (2002L, null, ts(250), "n3"))
    val tied = Seq( // both at ts 200 = exactly a bucket boundary
      (3000L, "tie", ts(200), "p"), (3001L, "tie", ts(200), "q"),
      (3002L, "tie", ts(300), "r"))
    val lone = Seq((4000L, "lone", ts(77), "only"))
    // NULL event-times: NULL ts → NULL __bucket in the bucketed forms;
    // the carry join must be null-safe on the bucket too (ADVICE r9) —
    // both on a key that also has real timestamps and on an all-NULL key
    val nullTs = Seq(
      (5000L, "hot", null.asInstanceOf[Timestamp], "nt1"),
      (5001L, "hot", null.asInstanceOf[Timestamp], "nt2"),
      (5002L, "nts", null.asInstanceOf[Timestamp], "nt3"),
      (5003L, "nts", null.asInstanceOf[Timestamp], "nt4"),
      (5004L, "nts", ts(500), "nt5"))
    (dominant ++ sparse ++ nulls ++ tied ++ lone ++ nullTs)
      .toDF("event_id", "user_id", "ets", "event_type")
  }

  test("bucketed examples are output-identical to the key-window form " +
      "on a dominant-key fixture (empty buckets, NULL keys, ties)") {
    val ev = skewedFixture
    // bucketSeconds=100 → the dominant key spans ~148 buckets
    val plain = Sequences.nextEventExamples(ev, "user_id", "ets",
      "event_id", "event_type", contextLen = 3)
    val bucketed = Sequences.nextEventExamplesBucketed(ev, "user_id",
      "ets", "event_id", "event_type", contextLen = 3,
      bucketSeconds = 100L)
    assert(plain.count() === bucketed.count())
    assert(plain.exceptAll(bucketed).isEmpty &&
      bucketed.exceptAll(plain).isEmpty)
  }

  test("property: bucketed forms equal the key-window forms on " +
      "seeded-random inputs, for any bucket width, context length, " +
      "and partitioning") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val nKeys = 1 + rnd.nextInt(6)
      val rows = (0 until 500 + rnd.nextInt(1500)).map { i =>
        val key = rnd.nextInt(nKeys + 1) match {
          case 0 => null: String // NULL keys group together
          case k => s"k$k"
        }
        // coarse ts granularity forces ties AND bucket-boundary hits;
        // ~5% NULL event-times exercise the null-safe bucket carry
        val t = if (rnd.nextInt(20) == 0) null.asInstanceOf[Timestamp]
                else ts(rnd.nextInt(5000) * 10L)
        (i.toLong, key, t, s"t${rnd.nextInt(4)}")
      }
      val ev = rows.toDF("event_id", "user_id", "ets", "event_type")
        .repartition(1 + rnd.nextInt(8))
      val contextLen = 1 + rnd.nextInt(4)
      val bucketSeconds = Seq(7L, 100L, 3600L)(rnd.nextInt(3))
      val plain = Sequences.nextEventExamples(ev, "user_id", "ets",
        "event_id", "event_type", contextLen)
      val bucketed = Sequences.nextEventExamplesBucketed(ev, "user_id",
        "ets", "event_id", "event_type", contextLen, bucketSeconds)
      assert(plain.exceptAll(bucketed).isEmpty &&
        bucketed.exceptAll(plain).isEmpty,
        s"seed=$seed ctx=$contextLen bucket=$bucketSeconds")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ets", "event_id")
      val leadRef = ev.withColumn("next_event_type",
        lead(col("event_type"), 1).over(w))
      val leadGot = Sequences.nextEventBucketed(ev, "user_id", "ets",
        "event_id", Seq("event_type"), bucketSeconds)
      assert(leadRef.select(leadRef.columns.sorted.map(col): _*)
        .exceptAll(leadGot.select(leadGot.columns.sorted.map(col): _*))
        .isEmpty, s"lead: seed=$seed bucket=$bucketSeconds")
    }
  }

  test("bucketed next-event attach matches lead(1) over the key window") {
    import org.apache.spark.sql.expressions.Window
    val ev = skewedFixture
    val w = Window.partitionBy("user_id").orderBy("ets", "event_id")
    val plain = ev
      .withColumn("next_ets", lead(col("ets"), 1).over(w))
      .withColumn("next_event_type", lead(col("event_type"), 1).over(w))
    val bucketed = Sequences.nextEventBucketed(ev, "user_id", "ets",
      "event_id", Seq("ets", "event_type"), bucketSeconds = 100L)
      .withColumnRenamed("next_ets", "next_ets")
    assert(plain.count() === bucketed.count())
    assert(plain.select(plain.columns.sorted.map(col): _*)
      .exceptAll(bucketed.select(bucketed.columns.sorted.map(col): _*))
      .isEmpty)
  }
}
