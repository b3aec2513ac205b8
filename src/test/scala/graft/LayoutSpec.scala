package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.operators.Layout.RangePred

/** Z-order key correctness and the zone-map skipping audit. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey2 matches the local bit-interleave on the full grid") {
    def local(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .sum
    val grid = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zorderKey2(col("x"), col("y"), 5).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    grid.foreach { case (x, y) =>
      assert(got((x, y)) == local(x, y, 5), s"($x,$y)")
    }
    // bijective on the 32x32 grid: 1024 distinct keys in [0, 1024)
    val keys = got.values.toSet
    assert(keys.size == 1024 && keys.min == 0L && keys.max == 1023L)
  }

  test("skippingAudit: hand-checked zone maps on four known files") {
    // 8 rows, 4 files of 2; x ascending so file boxes are
    // [0,1],[2,3],[4,5],[6,7]; y constant
    val df = (0L until 8L).map(i => (i, i.toDouble, 1L))
      .toDF("id", "x", "y")
    val got = Layout.skippingAudit(df, "sorted", Seq("x", "id"),
        "x", "y", 4,
        Seq(RangePred("mid", Some(2.5), Some(4.5), None, None),
          RangePred("all_y", None, None, Some(0.0), Some(9.0)),
          RangePred("none", Some(100.0), Some(200.0), None, None)))
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3))).toMap
    // mid touches files [2,3] and [4,5] -> skips 2 of 4
    assert(got("mid") == (4L, 2L), got.toString)
    assert(got("all_y") == (4L, 0L))
    assert(got("none") == (4L, 4L))
  }

  test("layout story: z-order skips on BOTH dims, natural on neither") {
    val rnd = new scala.util.Random(13)
    val ev = (1L to 2000L).map(i =>
      (i, rnd.nextInt(512).toDouble, rnd.nextInt(160).toLong))
      .toDF("event_id", "value", "user_id")
    val xb = least(lit(31L), floor(col("value") / 16.0).cast("long"))
    val yb = least(lit(31L), floor(col("user_id") / 5.0).cast("long"))
    val withZ = ev.withColumn("zkey", Layout.zorderKey2(xb, yb, 5))
    val preds = Seq(
      RangePred("p_x", Some(100.0), Some(150.0), None, None),
      RangePred("p_y", None, None, Some(40.0), Some(60.0)))
    def fracs(layout: String, keys: Seq[String]) =
      Layout.skippingAudit(withZ, layout, keys, "value", "user_id",
          32, preds)
        .collect().map(r => r.getString(1) -> r.getDouble(4)).toMap
    val nat = fracs("natural", Seq("event_id"))
    val zo = fracs("zorder", Seq("zkey", "event_id"))
    assert(nat("p_x") == 0.0 && nat("p_y") == 0.0, nat.toString)
    assert(zo("p_x") > 0.3 && zo("p_y") > 0.3, zo.toString)
  }
}
