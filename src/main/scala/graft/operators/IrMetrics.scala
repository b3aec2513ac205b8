package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IR evaluation metrics (P@K, R@K, nDCG@K, MRR, AP) as one declarative
  * plan over (results, qrels) — operator A5, plus the W6 first-hit doc
  * collapse.
  *
  * Semantics mirror packages/shared/benchmarks/metrics.py:44-320 exactly:
  *  - relevant = grade > 0 (binary set for P/R/MRR/AP)
  *  - P@K divides by k even when fewer results exist
  *  - R@K, AP divide by |all relevant in qrels|, 0 when none
  *  - DCG discount = grade / log2(rank+1) (1-based rank)
  *  - ideal DCG sorts ALL the query's qrels grades desc (not only
  *    retrieved ones); nDCG = 0 when a query has no qrels
  *  - MRR = 1 / rank of first relevant, 0 if none
  *
  * Scale posture: everything is partitioned by query_id — one shuffle,
  * then window functions inside each query's partition; the macro
  * average is a second tiny aggregation. No driver-side loops.
  */
object IrMetrics {
  val DefaultKValues: Seq[Int] = Seq(5, 10, 20) // ref metrics.py:271-272

  /** W6: collapse a chunk ranking to a doc ranking, first hit per doc,
    * order preserving (ref metrics.py:12-41). Input needs
    * (query_id, rank, doc_id); output re-ranks docs 1..n. */
  def collapseToDocs(chunkResults: DataFrame): DataFrame = {
    val firstHit = Window.partitionBy("query_id", "doc_id").orderBy("rank")
    val reRank = Window.partitionBy("query_id").orderBy("rank")
    chunkResults
      .withColumn("_hit", row_number().over(firstHit))
      .filter(col("_hit") === 1).drop("_hit")
      .withColumn("rank", row_number().over(reRank))
  }

  /** Per-query metrics, long format: (query_id, metric, k, value).
    * `results`: (query_id, rank, doc_id) with rank 1-based, dense.
    * `qrels`:   (query_id, doc_id, grade) grades 0–3. */
  def perQuery(results: DataFrame, qrels: DataFrame,
               kValues: Seq[Int] = DefaultKValues): DataFrame = {
    val graded = results
      .join(qrels, Seq("query_id", "doc_id"), "left")
      .withColumn("grade", coalesce(col("grade"), lit(0)))
      .withColumn("is_rel", (col("grade") > 0).cast("int"))
    val wCum = Window.partitionBy("query_id").orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = graded.withColumn("cum_rel", sum("is_rel").over(wCum))

    // per-query ground-truth totals (from qrels, incl. docs never retrieved)
    val truth = qrels.groupBy("query_id").agg(
      sum((col("grade") > 0).cast("int")).as("n_relevant"),
      count("*").as("n_qrels"))

    // ideal DCG at each k: rank qrels grades desc within query
    val wIdeal = Window.partitionBy("query_id")
      .orderBy(col("grade").desc, col("doc_id"))
    val idealRanked = qrels
      .withColumn("irank", row_number().over(wIdeal))

    val perK = kValues.map { k =>
      val atK = cum.filter(col("rank") <= k)
      val dcg = atK.groupBy("query_id").agg(
        sum(col("is_rel")).as("rel_at_k"),
        sum(col("grade").cast("double") / log2(col("rank") + 1)).as("dcg"))
      val idcg = idealRanked.filter(col("irank") <= k)
        .groupBy("query_id")
        .agg(sum(col("grade").cast("double") / log2(col("irank") + 1)).as("idcg"))
      val base = results.select("query_id").distinct()
        .join(dcg, Seq("query_id"), "left")
        .join(idcg, Seq("query_id"), "left")
        .join(truth, Seq("query_id"), "left")
        .na.fill(0.0, Seq("dcg", "idcg"))
        .na.fill(0L, Seq("rel_at_k", "n_relevant", "n_qrels"))
      base.select(col("query_id"),
        lit("precision").as("metric"), lit(k).as("k"),
        (col("rel_at_k").cast("double") / k).as("value"))
        .unionAll(base.select(col("query_id"),
          lit("recall").as("metric"), lit(k).as("k"),
          when(col("n_relevant") > 0,
            col("rel_at_k").cast("double") / col("n_relevant"))
            .otherwise(0.0).as("value")))
        .unionAll(base.select(col("query_id"),
          lit("ndcg").as("metric"), lit(k).as("k"),
          when(col("idcg") > 0, col("dcg") / col("idcg"))
            .otherwise(0.0).as("value")))
    }

    // MRR + AP (k-independent)
    val mrrAp = cum.groupBy("query_id").agg(
      min(when(col("is_rel") === 1, col("rank"))).as("first_rel"),
      sum(when(col("is_rel") === 1,
        col("cum_rel").cast("double") / col("rank"))).as("p_sum"))
    val tail = results.select("query_id").distinct()
      .join(mrrAp, Seq("query_id"), "left")
      .join(truth, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_relevant"))
    val mrr = tail.select(col("query_id"),
      lit("mrr").as("metric"), lit(0).as("k"),
      coalesce(lit(1.0) / col("first_rel"), lit(0.0)).as("value"))
    val ap = tail.select(col("query_id"),
      lit("ap").as("metric"), lit(0).as("k"),
      when(col("n_relevant") > 0,
        coalesce(col("p_sum"), lit(0.0)) / col("n_relevant"))
        .otherwise(0.0).as("value"))

    (perK :+ mrr :+ ap).reduce(_ unionAll _)
  }

  /** Macro average across queries per (metric, k) — the run-level
    * number the reference reports (evaluator.py:118-308). */
  def macroAveraged(results: DataFrame, qrels: DataFrame,
                    kValues: Seq[Int] = DefaultKValues): DataFrame =
    perQuery(results, qrels, kValues)
      .groupBy("metric", "k")
      .agg(avg("value").as("value"), count("*").as("n_queries"))
}
