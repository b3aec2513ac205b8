package graft.operators

import org.apache.spark.sql.DataFrame
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
    *                      as `asof_<rightTs>`) */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightPayload: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val payloadCols = (rightTs +: rightPayload).distinct
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val pStruct = struct(payloadCols.map(col): _*)
    val lType = left.select(lStruct.as("__l")).schema("__l").dataType
    val pType = right.select(pStruct.as("__p")).schema("__p").dataType
    val lu = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
        lStruct.as("__l"), lit(null).cast(pType).as("__p")): _*)
    val ru = right.select(
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
}
