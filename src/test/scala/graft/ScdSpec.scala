package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Scd

/** SCD2 merge: the four row fates, null-safe attribute comparison,
  * idempotence, and the untouched-history contract. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private val t1 = lit("2024-01-01 00:00:00").cast("timestamp")
  private val t2 = lit("2024-02-01 00:00:00").cast("timestamp")

  private def emptyDim(snap: org.apache.spark.sql.DataFrame) = snap
    .withColumn("valid_from", t1)
    .withColumn("valid_to", lit(null).cast("timestamp"))
    .filter(lit(false))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k", "valid_from").collect().map(r =>
      (r.getString(0), Option(r.get(1)),
        r.getTimestamp(2), Option(r.getTimestamp(3)))).toSeq

  test("change, delete, add, and unchanged fates in one merge") {
    val snap1 = Seq(("stay", Some("a")), ("chg", Some("x")),
      ("del", Some("d"))).toDF("k", "v")
    val snap2 = Seq(("stay", Some("a")), ("chg", Some("y")),
      ("add", Some("n"))).toDF("k", "v")
    val dim1 = Scd.scd2Merge(emptyDim(snap1), snap1, "k", Seq("v"), t1)
    val dim2 = Scd.scd2Merge(dim1, snap2, "k", Seq("v"), t2)
    assert(rows(dim2) == Seq(
      ("add", Some("n"), ts("2024-02-01 00:00:00"), None),
      ("chg", Some("x"), ts("2024-01-01 00:00:00"),
        Some(ts("2024-02-01 00:00:00"))),
      ("chg", Some("y"), ts("2024-02-01 00:00:00"), None),
      ("del", Some("d"), ts("2024-01-01 00:00:00"),
        Some(ts("2024-02-01 00:00:00"))),
      ("stay", Some("a"), ts("2024-01-01 00:00:00"), None)),
      rows(dim2).toString)
  }

  test("null attributes compare as values, not wildcards") {
    val snap1 = Seq(("k1", None: Option[String]), ("k2", Some("v")))
      .toDF("k", "v")
    val snap2 = Seq(("k1", None: Option[String]), ("k2", None))
      .toDF("k", "v")
    val dim1 = Scd.scd2Merge(emptyDim(snap1), snap1, "k", Seq("v"), t1)
    val dim2 = Scd.scd2Merge(dim1, snap2, "k", Seq("v"), t2)
    val got = rows(dim2)
    // k1: null == null -> unchanged; k2: v -> null is a CHANGE
    assert(got == Seq(
      ("k1", None, ts("2024-01-01 00:00:00"), None),
      ("k2", Some("v"), ts("2024-01-01 00:00:00"),
        Some(ts("2024-02-01 00:00:00"))),
      ("k2", None, ts("2024-02-01 00:00:00"), None)), got.toString)
  }

  test("re-merging the same snapshot is a no-op (idempotent)") {
    val snap = Seq(("a", Some("1")), ("b", Some("2"))).toDF("k", "v")
    val dim1 = Scd.scd2Merge(emptyDim(snap), snap, "k", Seq("v"), t1)
    val dim2 = Scd.scd2Merge(dim1, snap, "k", Seq("v"), t2)
    assert(rows(dim2) == rows(dim1))
  }

  test("closed history survives merges untouched") {
    val snap1 = Seq(("a", Some("1"))).toDF("k", "v")
    val snap2 = Seq(("a", Some("2"))).toDF("k", "v")
    val snap3 = Seq(("a", Some("3"))).toDF("k", "v")
    val t3 = lit("2024-03-01 00:00:00").cast("timestamp")
    val d = Scd.scd2Merge(
      Scd.scd2Merge(
        Scd.scd2Merge(emptyDim(snap1), snap1, "k", Seq("v"), t1),
        snap2, "k", Seq("v"), t2),
      snap3, "k", Seq("v"), t3)
    assert(rows(d) == Seq(
      ("a", Some("1"), ts("2024-01-01 00:00:00"),
        Some(ts("2024-02-01 00:00:00"))),
      ("a", Some("2"), ts("2024-02-01 00:00:00"),
        Some(ts("2024-03-01 00:00:00"))),
      ("a", Some("3"), ts("2024-03-01 00:00:00"), None)),
      rows(d).toString)
  }

  test("applyChangelog: latest op per key wins — U updates, D deletes " +
      "(even over an earlier U), I inserts, untouched keys pass " +
      "through; D of an absent key is a no-op") {
    val base = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L))
      .toDF("k", "v")
    val log = Seq(
      ("U", "a", 10L, 1L),  // plain update
      ("U", "b", 20L, 1L), ("D", "b", 0L, 2L), // U then D → deleted
      ("D", "c", 0L, 1L), ("U", "c", 30L, 2L), // D then U → resurrected
      ("I", "e", 5L, 1L),   // insert
      ("D", "zz", 0L, 1L))  // delete of an absent key: no-op
      .toDF("op", "k", "v", "seq")
    val got = Scd.applyChangelog(base, log, "k", "seq", "op")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 10L, "c" -> 30L, "d" -> 4L, "e" -> 5L),
      got.toString)
  }

  test("applyChangelog property: equals the latest-op reference replay " +
      "on seeded random logs (mixed I/U/D, multi-op keys, absent-key " +
      "ops, random partitioning)") {
    import org.apache.spark.sql.expressions.Window
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val keys = (1 to 30).map(i => s"k$i")
      val baseRows = keys.take(20).zipWithIndex
        .map { case (k, i) => (k, i.toLong) }
      val base = baseRows.toDF("k", "v").repartition(1 + rnd.nextInt(6))
      val logRows = (1 to 120).map { i =>
        (Seq("I", "U", "D")(rnd.nextInt(3)),
          keys(rnd.nextInt(keys.length)),
          rnd.nextInt(1000).toLong, i.toLong) // seq unique per key
      }
      val log = logRows.toDF("op", "k", "v", "seq")
        .repartition(1 + rnd.nextInt(6))
      val got = Scd.applyChangelog(base, log, "k", "seq", "op")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // reference: driver-side latest-op fold
      val latest = logRows.groupBy(_._2).view
        .mapValues(_.maxBy(_._4)).toMap
      val exp = (baseRows.map(_._1) ++ latest.keys).distinct.flatMap { k =>
        latest.get(k) match {
          case Some(("D", _, _, _)) => None
          case Some((_, _, v, _)) => Some(k -> v)
          case None => baseRows.find(_._1 == k).map(b => k -> b._2)
        }
      }.toMap
      assert(got == exp, s"seed=$seed: got=$got exp=$exp")
    }
  }

  test("maintainCountSum: I/U/D deltas apply, untouched groups pass " +
      "through, groups reaching zero rows drop (the recompute " +
      "equivalence)") {
    val base = Seq(("a", 2L, 100L), ("b", 1L, 50L), ("c", 3L, 30L))
      .toDF("grp", "n_rows", "sum_val")
    val log = Seq(
      ("I", "a", None, Some(10L)),        // a: 3 rows, 110
      ("U", "a", Some(40L), Some(45L)),   // a: 115
      ("D", "b", Some(50L), None),        // b: 0 rows -> dropped
      ("I", "d", None, Some(7L)))         // d: new group from the log
      .toDF("op", "grp", "before_val", "after_val")
    val got = Scd.maintainCountSum(base, log, "grp", "op",
        "before_val", "after_val")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map("a" -> ((3L, 115L)), "c" -> ((3L, 30L)),
      "d" -> ((1L, 7L))), got.toString)
  }

  test("maintainCountSum equals a recompute on a randomized base+log " +
      "(seeded)") {
    val rnd = new scala.util.Random(7)
    val groups = Seq("g0", "g1", "g2", "g3")
    val baseRows = (0 until 40).map(i =>
      (i.toLong, groups(rnd.nextInt(4)), rnd.nextInt(100).toLong))
    // log: delete %5, update %3 (not deleted), insert 10 new rows
    val del = baseRows.filter(_._1 % 5 == 0)
      .map(r => ("D", r._2, Some(r._3), None: Option[Long]))
    val upd = baseRows.filter(r => r._1 % 3 == 0 && r._1 % 5 != 0)
      .map(r => ("U", r._2, Some(r._3), Some(r._3 + 7L)))
    val ins = (0 until 10).map(_ =>
      ("I", groups(rnd.nextInt(4)), None: Option[Long],
        Some(rnd.nextInt(100).toLong)))
    val base = baseRows.map(r => (r._2, r._3)).toDF("grp", "v")
      .groupBy("grp").agg(count(lit(1)).as("n_rows"),
        sum("v").as("sum_val"))
    val got = Scd.maintainCountSum(base,
        (del ++ upd ++ ins).toDF("op", "grp", "before_val", "after_val"),
        "grp", "op", "before_val", "after_val")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // recompute over the post state
    val post = baseRows.filter(_._1 % 5 != 0)
      .map(r => (r._2, if (r._1 % 3 == 0) r._3 + 7L else r._3)) ++
      ins.map(i => (i._2, i._4.get))
    val exp = post.groupBy(_._1).view.mapValues(vs =>
      (vs.size.toLong, vs.map(_._2).sum)).filter(_._2._1 > 0).toMap
    assert(got == exp, s"got=$got exp=$exp")
  }
}
