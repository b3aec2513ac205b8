package graft.operators

import org.apache.spark.sql.DataFrame
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
    val p = points.withColumn("__bucket",
      floor(col(tsCol) / bucketWidth).cast("long"))
    // [start, end): the last covered bucket is floor((end-1)/width);
    // empty intervals (end <= start) cover no bucket and match nothing
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor((col(endCol) - 1) / bucketWidth).cast("long"))))
    p.join(iv, keys :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
