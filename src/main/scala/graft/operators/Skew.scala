package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot-key joins and aggregations.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * helpers cover the cases AQE can't: deterministic salting for
  * hot-key equi-joins against a replicable small-to-medium side, and
  * two-phase (partial → final) aggregation for skewed group keys.
  */
object Skew {

  /** Salted equi-join: the skewed (large) side spreads each hot key
    * over `numSalts` sub-keys via a deterministic hash of `saltBy`
    * (any unique-ish column, e.g. the row's primary key); the other
    * side replicates `numSalts`×. Result equals the plain inner join,
    * but the shuffle spreads hot keys across numSalts partitions.
    * Replication cost: |right| × numSalts — keep the replicated side
    * the smaller one. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 saltBy: Column, numSalts: Int): DataFrame = {
    require(numSalts > 0)
    val salted = skewed.withColumn("_salt",
      pmod(abs(hash(saltBy)), lit(numSalts)))
    val replicated = other.withColumn("_salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** Two-phase aggregation for skewed group-by keys: first aggregate
    * on (key, salt), then combine per key. `partialAggs` must be
    * decomposable (sum/count/min/max); the caller supplies the final
    * combine step over the partial column names. */
  def twoPhaseAgg(df: DataFrame, keys: Seq[String], saltBy: Column,
                  numSalts: Int, partialAggs: Seq[Column],
                  finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(abs(hash(saltBy)), lit(numSalts)))
    val partial = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
