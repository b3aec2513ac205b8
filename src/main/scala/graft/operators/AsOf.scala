package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the single
  * most recent right row with `right.ts <= left.ts` for the same key —
  * the standard enrichment join of event attribution, feature stores,
  * and market data. Spark has no ASOF JOIN operator, and the naive
  * `l.key = r.key AND l.ts >= r.ts` formulation plans as an inequality
  * join (per-key pair explosion — a BroadcastNestedLoopJoin or a
  * row-count product at scale).
  *
  * This is the UNION–WINDOW form instead: tag both sides, union them,
  * and take `last(right payload ignoring nulls)` over a window
  * partitioned by key and ordered by (ts, side). ONE shuffle by key,
  * O(n log n) sort per key, zero pair explosion — the plan scales
  * exactly like any windowed aggregation. At equal timestamps the
  * right row sorts first, so the match is inclusive (`>=`), matching
  * DuckDB's ASOF JOIN — which is precisely what the driver oracle
  * compares against.
  *
  * Contract: the right side must be unique per (key, ts) — the same
  * requirement real ASOF implementations impose; aggregate the right
  * side first (the `asof_join` driver query keeps max(event_id) per
  * second). Left rows with no prior right row keep NULL payload
  * columns (ASOF LEFT JOIN semantics).
  */
object AsOf {

  /** @param keys          equi-join key columns (both sides)
    * @param leftTs        left timestamp column name
    * @param rightTs       right timestamp column name
    * @param rightPayload  right columns to attach (each surfaced as
    *                      `asof_<name>`; `rightTs` itself is attached
    *                      as `asof_<rightTs>`)
    *
    * Skew posture: the window partitions by KEY only, so one dominant
    * key (a global instrument, a null-ish default key) serializes its
    * entire merged timeline through a single sort task — the same
    * hazard [[RangeJoin.pointInInterval]] dodges with time bucketing.
    * When the key distribution is skewed, use [[joinAsOfBucketed]],
    * which is output-identical and partitions by (key, time-bucket). */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightPayload: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    // equality-join NULL semantics: a NULL key never matches (the
    // window partition would otherwise group left and right NULLs
    // together and match them); right NULL-key rows are unmatchable,
    // left NULL-key rows keep NULL payload through the same window
    val rightNN = keys.foldLeft(right)((d, k) => d.filter(col(k).isNotNull))
    val payloadCols = (rightTs +: rightPayload).distinct
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val pStruct = struct(payloadCols.map(col): _*)
    val lType = left.select(lStruct.as("__l")).schema("__l").dataType
    val pType = right.select(pStruct.as("__p")).schema("__p").dataType
    val lu = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
        lStruct.as("__l"), lit(null).cast(pType).as("__p")): _*)
    val ru = rightNN.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"), pStruct.as("__p")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lu.unionByName(ru)
      .withColumn("__match", last("__p", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(c => col("__l." + c).as(c)) ++
        payloadCols.map(c => col("__match." + c).as(s"asof_$c")): _*)
  }

  /** FORWARD as-of: for every left row, the FIRST right row with
    * `right.ts >= left.ts` (equal ts inclusive) of the same key — the
    * next-event attribution dual of [[joinAsOf]] (time-to-conversion,
    * next-fill lookups). Implemented by DELEGATION: backward-as-of on
    * negated ticks is exactly forward-as-of on the originals, so the
    * plan, skew posture, and uniqueness contract are [[joinAsOf]]'s
    * verbatim. The negation trick needs integral tick columns (a
    * Catalyst timestamp negate is undefined; cast timestamps to
    * `unix_micros` first — the [[graft.plans.AsOfExec]] contract). */
  def joinAsOfForward(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    def integral(df: DataFrame, c: String): Boolean =
      df.schema(c).dataType == LongType || df.schema(c).dataType == IntegerType
    require(integral(left, leftTs) && integral(right, rightTs),
      s"forward as-of needs integral tick columns ('$leftTs'/'$rightTs');" +
        " cast timestamps to unix_micros")
    joinAsOf(
        left.withColumn("__neg_ts", -col(leftTs)),
        right.withColumn("__neg_ts", -col(rightTs)),
        keys, "__neg_ts", "__neg_ts", rightPayload)
      .drop("__neg_ts", "asof___neg_ts")
  }

  /** [[joinAsOf]] with a time-bucketed hot-key posture — OUTPUT-
    * IDENTICAL, but the row-level work partitions by (key, bucket)
    * instead of key alone, so a dominant key's timeline spreads over
    * `span / bucketWidth` tasks instead of serializing through one.
    *
    * Two-level plan, both levels windowed-aggregation shapes:
    *  1. In-bucket match: union left and right rows on (key, bucket)
    *     and take `last(right payload ignoring nulls)` ordered by
    *     (ts, side) — the [[joinAsOf]] form, scoped to a bucket.
    *  2. Cross-bucket carry: the latest right row of each (key,
    *     bucket) — ONE row per occupied bucket, `max_by` map-side
    *     partial — joined as-of on the BUCKET axis to the distinct
    *     left (key, bucket) set via the same union-window form. Both
    *     relations are bounded by occupied-bucket counts (span /
    *     width per key), never by row counts, so the key-partitioned
    *     window at this level is over a relation that hot keys cannot
    *     inflate.
    * A left row's match is its in-bucket match when one exists,
    * else its bucket's carried prior-bucket state (strictly earlier
    * buckets only — an equal-bucket carry could postdate the left
    * row, which is why level 2 orders the carry AFTER the left probe
    * at equal bucket).
    *
    * Timestamps may be TIMESTAMP (bucketed on unix_micros;
    * `bucketWidth` in MICROSECONDS) or any integral type (bucketed on
    * the raw value). Pick `bucketWidth` near the typical left-to-match
    * gap: narrower buckets → more carry rows; wider → hot-key relief
    * degrades toward [[joinAsOf]]. */
  def joinAsOfBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      bucketWidth: Long): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    import org.apache.spark.sql.types.TimestampType
    def tick(df: DataFrame, c: String): Column =
      if (df.schema(c).dataType == TimestampType) unix_micros(col(c))
      else col(c).cast("long")
    // floor-division in LONG arithmetic — the RangeJoin.pointInInterval
    // discipline (floor(col / w) rounds through double past 2^53)
    def bucketOf(t: Column): Column = {
      val n = t - pmod(t, lit(bucketWidth))
      (n / bucketWidth).cast("long") // exact: n is a multiple of width
    }
    val payloadCols = (rightTs +: rightPayload).distinct
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val pStruct = struct(payloadCols.map(col): _*)
    val lType = left.select(lStruct.as("__l")).schema("__l").dataType
    val pType = right.select(pStruct.as("__p")).schema("__p").dataType

    val lu = left.select(
      keys.map(col) ++ Seq(tick(left, leftTs).as("__ts"),
        lit(1).as("__side"), lStruct.as("__l"),
        lit(null).cast(pType).as("__p")): _*)
      .withColumn("__bucket", bucketOf(col("__ts")))
    // NULL keys never match (the joinAsOf equality-join discipline)
    val rightNN = keys.foldLeft(right)((d, k) => d.filter(col(k).isNotNull))
    val ru = rightNN.select(
      keys.map(col) ++ Seq(tick(right, rightTs).as("__ts"),
        lit(0).as("__side"), lit(null).cast(lType).as("__l"),
        pStruct.as("__p")): _*)
      .withColumn("__bucket", bucketOf(col("__ts")))

    // level 2: one row per occupied right bucket (map-side partial
    // agg), as-of joined on the bucket axis to the distinct left
    // bucket set. __cside 0 = left probe, 1 = carry: at EQUAL bucket
    // the probe sorts FIRST, so only strictly-earlier carries bind —
    // an equal-bucket carry may postdate the left row, and the
    // in-bucket window already resolves that bucket exactly.
    val carry = ru.groupBy((keys.map(col) :+ col("__bucket")): _*)
      .agg(max_by(col("__p"), col("__ts")).as("__cp"))
      .select(keys.map(col) ++ Seq(col("__bucket"),
        lit(1).as("__cside"), col("__cp")): _*)
    val probes = lu.select(keys.map(col) :+ col("__bucket"): _*).distinct()
      .select(keys.map(col) ++ Seq(col("__bucket"),
        lit(0).as("__cside"), lit(null).cast(pType).as("__cp")): _*)
    val wCarry = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__bucket"), col("__cside"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val priorCarry = probes.unionByName(carry)
      .withColumn("__prior", last("__cp", ignoreNulls = true).over(wCarry))
      .filter(col("__cside") === 0)
      .select(keys.map(col) ++ Seq(col("__bucket"), col("__prior")): _*)

    // level 1: the joinAsOf union-window, partitioned by (key, bucket)
    val wIn = Window.partitionBy((keys.map(col) :+ col("__bucket")): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL-SAFE key join back to the carry: a plain equi-join would
    // silently DROP left rows whose key is NULL (null never equals
    // null), even though the probe side carries their (key, bucket)
    // row; <=> keeps them and their carry is NULL by construction
    // (right NULL keys were filtered). Still a hash-joinable key.
    val inb = lu.unionByName(ru)
      .withColumn("__inb", last("__p", ignoreNulls = true).over(wIn))
      .filter(col("__side") === 1)
      .alias("L")
    val pc = priorCarry.alias("C")
    val cond = (keys.map(k => col(s"L.$k") <=> col(s"C.$k")) :+
      (col("L.__bucket") === col("C.__bucket"))).reduce(_ && _)
    inb.join(pc, cond)
      .withColumn("__match", coalesce(col("L.__inb"), col("C.__prior")))
      .select(left.columns.toIndexedSeq.map(c => col("L.__l." + c).as(c)) ++
        payloadCols.map(c => col("__match." + c).as(s"asof_$c")): _*)
  }
}
