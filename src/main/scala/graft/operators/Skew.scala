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

  /** Join-key skew probe — the "should I salt this join?" advisor run
    * BEFORE committing a shuffle plan: per-key counts in one
    * aggregation, the corpus-level skew statistics (max/mean ratio)
    * derived from that bounded relation, and the top-k hottest keys
    * cut with the bounded [[TopK]] aggregator (no rank window). A
    * skew_ratio near 1 means hash partitioning balances; a ratio of R
    * means the hottest key's partition carries ~R× the average — the
    * number that decides `numSalts` for [[saltedJoin]].
    * Output: (rank, key STRING, cnt, n_keys, total, skew_ratio). */
  def probe(df: DataFrame, keyCol: String, topK: Int = 5): DataFrame = {
    require(topK >= 1, s"bad topK: $topK")
    val kc = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
      // two consumers (stats + top-k cut); key-bounded relation, the
      // caller owns the checkpoint's session-scoped lifetime
      .localCheckpoint()
    val stats = broadcast(kc.agg(
      count(lit(1)).as("n_keys"), sum("cnt").as("total"),
      max("cnt").as("max_cnt")))
    TopK.perGroup(
        kc.select(lit("all").as("g"), col("key").as("doc_id"),
          col("key").as("chunk_id"), col("cnt").cast("double").as("score")),
        "g", topK)
      .select(col("rank"), col("doc_id").as("key"),
        col("score").cast("long").as("cnt"))
      .crossJoin(stats)
      .select(col("rank"), col("key"), col("cnt"), col("n_keys"),
        col("total"),
        round(col("max_cnt").cast("double") * col("n_keys") /
          col("total"), 6).as("skew_ratio"))
      .orderBy("rank")
  }

  /** Join-cardinality predictor — [[probe]]'s companion, run BEFORE an
    * equi-join is allowed into a plan: the exact output size of
    * `left ⋈ right` on a key is Σ_k f_L(k)·f_R(k), computable from the
    * two BOUNDED per-key count relations without materializing a
    * single joined row. The top contributors (by f_L·f_R product,
    * bounded TopK cut) name the keys that would explode — a self-join
    * on a hot key is quadratic in exactly these terms.
    * Output: (rank, key STRING, left_cnt, right_cnt, contrib,
    * est_rows, n_match_keys). */
  def joinCardinality(left: DataFrame, leftKey: String,
                      right: DataFrame, rightKey: String,
                      topK: Int = 5): DataFrame = {
    require(topK >= 1, s"bad topK: $topK")
    def counts(df: DataFrame, k: String, c: String) =
      df.groupBy(col(k).cast("string").as("key"))
        .agg(count(lit(1)).as(c))
    val contrib = counts(left, leftKey, "left_cnt")
      .join(counts(right, rightKey, "right_cnt"), "key")
      .withColumn("contrib", col("left_cnt") * col("right_cnt"))
      // two consumers (totals + top-k cut); matching-key-bounded, the
      // caller owns the checkpoint's session-scoped lifetime
      .localCheckpoint()
    val totals = broadcast(contrib.agg(
      sum("contrib").as("est_rows"),
      count(lit(1)).as("n_match_keys")))
    val cut = TopK.perGroup(
        contrib.select(lit("all").as("g"), col("key").as("doc_id"),
          col("key").as("chunk_id"),
          col("contrib").cast("double").as("score")),
        "g", topK)
      .select(col("rank"), col("doc_id").as("key"))
    // the bounded cut joins back as the broadcast side (the
    // distinctiveTerms discipline)
    contrib.join(broadcast(cut), "key")
      .crossJoin(totals)
      .select(col("rank"), col("key"), col("left_cnt"),
        col("right_cnt"), col("contrib"), col("est_rows"),
        col("n_match_keys"))
      .orderBy("rank")
  }
}
