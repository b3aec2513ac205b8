package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: left points `(key, ts)` matched to
  * right intervals `(key, [start, end))` — the enrichment join behind
  * outage attribution, session containment, and validity-window
  * lookups. Spark plans the naive `l.key = r.key AND ts >= start AND
  * ts < end` as an equi-join on key with the range as a post-filter —
  * correct, but every point meets every same-key interval first, which
  * goes quadratic on hot keys.
  *
  * Bucketed form instead: quantize the timeline into fixed-width
  * buckets, explode each interval into the buckets it covers, join
  * points on `(key, bucket)` equality, then re-check the exact range
  * predicate. The shuffle key gains time-locality, so a point meets
  * only the intervals whose span touches its bucket — candidate count
  * per point is bounded by interval density per bucket, independent of
  * key popularity. Pick `bucketWidth` near the TYPICAL interval
  * length: wider buckets → more false candidates; narrower → more
  * interval replicas (an interval explodes into
  * `(end − start) / width + 1` rows).
  *
  * Containment is inclusive-start exclusive-end (`start <= ts < end`),
  * and each (point, interval) pair matches at most once by
  * construction — a point lives in exactly one bucket, so no
  * post-join dedup is needed.
  */
object RangeJoin {

  /** @param points    left relation with `keys` and LONG column `tsCol`
    * @param intervals right relation with `keys` and LONG columns
    *                  `startCol` / `endCol` (end exclusive)
    * @param bucketWidth timeline quantum in `tsCol` units */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], tsCol: String, startCol: String,
                      endCol: String, bucketWidth: Long): DataFrame = {
    require(keys.nonEmpty, "range join needs at least one key column")
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    // exact integer floor-division: floor(x/w) as (x − pmod(x, w)) div w
    // — pmod keeps it floor (not trunc) for negative ticks, and the
    // integral `div` keeps the whole computation in LONG arithmetic.
    // `floor(col / w)` would round through DOUBLE division, which
    // loses precision past 2^53 (nanosecond-scale ticks) and can put a
    // point and its covering interval in DIFFERENT buckets near a
    // boundary, silently dropping the match.
    val w = bucketWidth
    def floorDivCols(df: org.apache.spark.sql.DataFrame,
        in: Map[String, Column]): org.apache.spark.sql.DataFrame = {
      val withNums = in.foldLeft(df) { case (d, (name, c)) =>
        d.withColumn(s"__n_$name", c.cast("long") - pmod(c.cast("long"), lit(w)))
      }
      val withBuckets = in.keys.foldLeft(withNums) { (d, name) =>
        d.withColumn(name, expr(s"__n_$name div ${w}L"))
      }
      in.keys.foldLeft(withBuckets)((d, name) => d.drop(s"__n_$name"))
    }
    val p = floorDivCols(points, Map("__bucket" -> col(tsCol)))
    // [start, end): the last covered bucket is floor((end-1)/width);
    // empty intervals (end <= start) cover no bucket and match nothing
    val iv = floorDivCols(
        intervals.filter(col(endCol) > col(startCol)),
        Map("__b0" -> col(startCol), "__b1" -> (col(endCol) - 1)))
      .withColumn("__bucket", explode(sequence(col("__b0"), col("__b1"))))
      .drop("__b0", "__b1")
    p.join(iv, keys :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }

  /** INTERVAL-overlap join — the interval × interval completion of
    * [[pointInInterval]]: left intervals `(key, [ls, le))` matched to
    * right intervals `(key, [rs, re))` that OVERLAP them
    * (`ls < re AND rs < le`, half-open semantics). Same timeline
    * quantization, plus the OWNER-BUCKET rule that keeps the join
    * duplicate-free WITHOUT a distinct: an overlapping pair co-occupies
    * every bucket of `[max(ls, rs), min(le, re))`, so exactly one
    * bucket — the FIRST common one, `bucketOf(max(ls, rs))` — owns the
    * pair, and the join filter accepts a candidate only in its owner
    * bucket. No post-join dedup shuffle; candidates per bucket are
    * bounded by interval density (both sides), independent of key
    * popularity. Empty intervals (end <= start) match nothing. Columns
    * must be LONG ticks (the [[pointInInterval]] contract); left and
    * right column names must be disjoint apart from `keys`. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      keys: Seq[String], leftStart: String, leftEnd: String,
                      rightStart: String, rightEnd: String,
                      bucketWidth: Long): DataFrame = {
    require(keys.nonEmpty, "overlap join needs at least one key column")
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val w = bucketWidth
    def bucketOf(c: Column): Column = {
      val n = c.cast("long") - pmod(c.cast("long"), lit(w))
      (n / w).cast("long") // exact: n is a multiple of width
    }
    def exploded(df: DataFrame, s: String, e: String) = df
      .filter(col(e) > col(s))
      .withColumn("__bucket", explode(
        sequence(bucketOf(col(s)), bucketOf(col(e) - 1))))
    val l = exploded(left, leftStart, leftEnd)
    val r = exploded(right, rightStart, rightEnd)
    l.join(r, keys :+ "__bucket")
      .filter(col(leftStart) < col(rightEnd) &&
        col(rightStart) < col(leftEnd))
      // owner-bucket rule: emit each overlapping pair exactly once
      .filter(col("__bucket") ===
        bucketOf(greatest(col(leftStart), col(rightStart))))
      .drop("__bucket")
  }
}
