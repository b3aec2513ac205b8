package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Plan shape: ALL metrics at ALL k values come out of ONE aggregation
  * per input (conditional sums per k) followed by a single explode into
  * long format — no per-metric union fan-out, so the upstream retrieval
  * DAG executes exactly once regardless of |kValues|. Everything is
  * partitioned by query_id; the macro average is one tiny extra
  * aggregation.
  */
object IrMetrics {
  val DefaultKValues: Seq[Int] = Seq(5, 10, 20) // ref metrics.py:271-272

  /** Array form of W6: given a hits array already ordered by rank
    * (structs carrying a `doc_id` field), keep the first hit per doc,
    * order preserving. Callers that already hold a per-query array
    * (e.g. the fused hybrid runs) apply this WITHOUT any exchange. */
  def collapseHits(hits: Column): Column =
    filter(hits, (x, i) =>
      !exists(slice(hits, lit(1), i),
        y => y.getField("doc_id") === x.getField("doc_id")))

  /** W6: collapse a chunk ranking to a doc ranking, first hit per doc,
    * order preserving (ref metrics.py:12-41). Input needs
    * (query_id, rank, doc_id); output re-ranks docs 1..n.
    *
    * One groupBy(query_id) exchange: a run is ≤ k rows per query BY
    * CONSTRUCTION (it already went through top-k), so the per-query
    * hit list fits a single array and the first-hit dedup is an
    * order-preserving array filter — where the window formulation
    * (first-hit window + re-rank window) costs two exchanges. */
  def collapseToDocs(chunkResults: DataFrame): DataFrame =
    chunkResults
      .groupBy("query_id")
      .agg(sort_array(collect_list(struct(col("rank"), col("doc_id"))))
        .as("hits"))
      .select(col("query_id"),
        posexplode(collapseHits(col("hits"))).as(Seq("_pos", "_h")))
      .select(col("query_id"), (col("_pos") + 1).cast("int").as("rank"),
        col("_h.doc_id").as("doc_id"))

  /** [[collapseToDocs]] keeping each query's doc ranking as ONE array
    * row (query_id, docs) — the input shape of
    * [[macroAveragedFromArrays]]. */
  def collapseToDocArrays(chunkResults: DataFrame): DataFrame =
    chunkResults
      .groupBy("query_id")
      .agg(sort_array(collect_list(struct(col("rank"), col("doc_id"))))
        .as("hits"))
      .select(col("query_id"),
        transform(collapseHits(col("hits")),
          h => h.getField("doc_id")).as("docs"))

  /** Wide per-query relation: one row per query carrying every metric
    * as a column (metric_name_k). Shared by [[perQuery]] (explode to
    * long format) and [[macroAveraged]] (average the columns FIRST,
    * then explode one row — one fewer exchange than averaging the
    * exploded long format). */
  private def wideMetrics(results: DataFrame, rawQrels: DataFrame,
                          kValues: Seq[Int]): (DataFrame, Seq[(String, Int, Column)]) = {
    // max(grade) per (query_id, doc_id) first — same duplicate-qrels
    // semantics as macroAveragedFromArrays, so the two formulations
    // agree on inputs with repeated judgments (and the left join below
    // can't fan results out)
    val qrels = rawQrels
      .groupBy("query_id", "doc_id").agg(max("grade").as("grade"))
    val graded = results
      .join(qrels, Seq("query_id", "doc_id"), "left")
      .withColumn("grade", coalesce(col("grade"), lit(0)))
      .withColumn("is_rel", (col("grade") > 0).cast("int"))
    val wCum = Window.partitionBy("query_id").orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = graded.withColumn("cum_rel", sum("is_rel").over(wCum))

    // one aggregation computes every @k accumulator plus MRR/AP inputs
    val perKAggs = kValues.flatMap { k =>
      Seq(
        sum(when(col("rank") <= k, col("is_rel")).otherwise(0))
          .as(s"rel_$k"),
        sum(when(col("rank") <= k,
          col("grade").cast("double") / log2(col("rank") + 1)).otherwise(0.0))
          .as(s"dcg_$k"))
    }
    val tailAggs = Seq(
      min(when(col("is_rel") === 1, col("rank"))).as("first_rel"),
      sum(when(col("is_rel") === 1,
        col("cum_rel").cast("double") / col("rank"))).as("p_sum"))
    val perQ = cum.groupBy("query_id")
      .agg((perKAggs ++ tailAggs).head, (perKAggs ++ tailAggs).tail: _*)

    // ground truth: relevant count + ideal DCG per k, one aggregation
    val wIdeal = Window.partitionBy("query_id")
      .orderBy(col("grade").desc, col("doc_id"))
    val idealAggs = kValues.map { k =>
      sum(when(col("irank") <= k,
        col("grade").cast("double") / log2(col("irank") + 1)).otherwise(0.0))
        .as(s"idcg_$k")
    } :+ sum((col("grade") > 0).cast("int")).as("n_relevant")
    val truth = qrels
      .withColumn("irank", row_number().over(wIdeal))
      .groupBy("query_id")
      .agg(idealAggs.head, idealAggs.tail: _*)

    // perQ has exactly one row per query_id present in `results`, so it
    // IS the query universe — deriving it from `results` again would
    // re-execute the (often deep) upstream retrieval DAG a second time.
    val base = perQ.join(truth, Seq("query_id"), "left")

    def z(c: Column): Column = coalesce(c, lit(0.0))
    val metrics: Seq[(String, Int, Column)] = kValues.flatMap { k =>
      Seq(
        ("precision", k, z(col(s"rel_$k").cast("double")) / k),
        ("recall", k,
          when(col("n_relevant") > 0,
            z(col(s"rel_$k").cast("double")) / col("n_relevant"))
            .otherwise(0.0)),
        ("ndcg", k,
          when(col(s"idcg_$k") > 0, z(col(s"dcg_$k")) / col(s"idcg_$k"))
            .otherwise(0.0)))
    } ++ Seq(
      ("mrr", 0, coalesce(lit(1.0) / col("first_rel"), lit(0.0))),
      ("ap", 0,
        when(col("n_relevant") > 0, z(col("p_sum")) / col("n_relevant"))
          .otherwise(0.0)))
    (base, metrics)
  }

  /** Per-query metrics, long format: (query_id, metric, k, value).
    * `results`: (query_id, rank, doc_id) with rank 1-based, dense.
    * `qrels`:   (query_id, doc_id, grade) grades 0–3. */
  def perQuery(results: DataFrame, qrels: DataFrame,
               kValues: Seq[Int] = DefaultKValues): DataFrame = {
    val (base, metrics) = wideMetrics(results, qrels, kValues)
    val metricStructs = metrics.map { case (name, k, value) =>
      struct(lit(name).as("metric"), lit(k).as("k"), value.as("value"))
    }
    base.select(col("query_id"), explode(array(metricStructs: _*)).as("m"))
      .select(col("query_id"), col("m.metric").as("metric"),
        col("m.k").as("k"), col("m.value").as("value"))
  }

  /** Macro-averaged metrics from PER-QUERY DOC ARRAYS — the zero-window
    * formulation for callers that already hold each query's collapsed
    * doc ranking as one array row (`runs`: (query_id, docs) ordered by
    * rank). The whole A5 fan-out then costs ONE broadcast-sized join
    * (qrels folded to a per-query grade map) plus ONE global
    * aggregation: every per-query accumulator — P/R@k, DCG/iDCG@k,
    * MRR, AP — is an O(k²)-bounded array fold inside the row, where
    * the relational form needs a cumulative window, two per-query
    * aggregations and an ideal-DCG window+join. Semantics are
    * value-identical to [[macroAveraged]] (bench_eval_docs hash-checks
    * this path against the DuckDB oracle); float sums accumulate in
    * rank order, which is MORE deterministic than engine agg order. */
  def macroAveragedFromArrays(runs: DataFrame, qrels: DataFrame,
                              kValues: Seq[Int] = DefaultKValues): DataFrame = {
    // max(grade) per (query_id, doc_id) first: duplicate qrels rows
    // would throw DUPLICATED_MAP_KEY in map_from_entries (default
    // mapKeyDedupPolicy=EXCEPTION); the relational form tolerated them
    val grades = qrels
      .groupBy("query_id", "doc_id").agg(max("grade").as("grade"))
      .groupBy("query_id")
      .agg(map_from_entries(collect_list(
        struct(col("doc_id"), col("grade")))).as("gmap"))
    val joined = runs.join(grades, Seq("query_id"), "left")

    def log2c(c: Column): Column = log(c.cast("double")) / log(lit(2.0))
    // grade per retrieved doc (0 when unjudged); rank i is 0-based
    val graded = transform(col("docs"), d =>
      coalesce(element_at(col("gmap"), d), lit(0)))
    val isRel = transform(graded, g => (g > 0).cast("int"))
    val dcgTerms = transform(graded, (g, i) =>
      g.cast("double") / log2c(i + lit(2)))
    def sumI(arr: Column): Column =
      coalesce(aggregate(arr, lit(0), (a, x) => a + x), lit(0))
    def sumD(arr: Column): Column =
      coalesce(aggregate(arr, lit(0.0), (a, x) => a + x), lit(0.0))
    // ideal DCG over ALL the query's qrels grades, sorted descending
    // (the doc_id tie-break of the window form cannot change the sum)
    val idealTerms = transform(
      reverse(array_sort(coalesce(map_values(col("gmap")),
        array().cast("array<int>")))),
      (g, i) => g.cast("double") / log2c(i + lit(2)))
    val nRelevant = sumI(transform(
      coalesce(map_values(col("gmap")), array().cast("array<int>")),
      g => (g > 0).cast("int")))
    val firstRel = array_position(isRel, 1) // 0 when no relevant hit
    // AP numerator: Σ_{relevant i} cumrel(i)/rank(i) — the inner slice
    // re-sum is O(k²) on a ≤k array, constant next to any exchange
    val apTerms = transform(isRel, (r, i) =>
      when(r === 1,
        sumI(slice(isRel, lit(1), i + lit(1))).cast("double") /
          (i + lit(1)).cast("double"))
        .otherwise(lit(0.0)))

    val metrics: Seq[(String, Int, Column)] = kValues.flatMap { k =>
      Seq(
        ("precision", k, sumI(slice(isRel, 1, k)).cast("double") / k),
        ("recall", k,
          when(nRelevant > 0,
            sumI(slice(isRel, 1, k)).cast("double") / nRelevant)
            .otherwise(0.0)),
        ("ndcg", k, {
          val idcg = sumD(slice(idealTerms, 1, k))
          when(idcg > 0, sumD(slice(dcgTerms, 1, k)) / idcg).otherwise(0.0)
        }))
    } ++ Seq(
      ("mrr", 0,
        when(firstRel > 0, lit(1.0) / firstRel.cast("double"))
          .otherwise(0.0)),
      ("ap", 0,
        when(nRelevant > 0, sumD(apTerms) / nRelevant).otherwise(0.0)))

    val aggs = metrics.zipWithIndex.map { case ((_, _, value), i) =>
      avg(value).as(s"_v$i")
    } :+ count(lit(1)).as("_n")
    val row = joined.agg(aggs.head, aggs.tail: _*).filter(col("_n") > 0)
    val structs = metrics.zipWithIndex.map { case ((name, k, _), i) =>
      struct(lit(name).as("metric"), lit(k).as("k"),
        col(s"_v$i").as("value"), col("_n").as("n_queries"))
    }
    row.select(explode(array(structs: _*)).as("m"))
      .select(col("m.metric").as("metric"), col("m.k").as("k"),
        col("m.value").as("value"), col("m.n_queries").as("n_queries"))
  }

  /** Macro average across queries per (metric, k) — the run-level
    * number the reference reports (evaluator.py:118-308). The averages
    * aggregate the WIDE per-query columns in one pass; the 11 metric
    * rows explode from the single aggregated row, so no exchange ever
    * carries the exploded long format. */
  def macroAveraged(results: DataFrame, qrels: DataFrame,
                    kValues: Seq[Int] = DefaultKValues): DataFrame = {
    val (base, metrics) = wideMetrics(results, qrels, kValues)
    val aggs = metrics.zipWithIndex.map { case ((_, _, value), i) =>
      avg(value).as(s"_v$i")
    } :+ count(lit(1)).as("_n")
    // a global agg over zero rows yields one all-NULL row — filter it
    // so an empty run set still returns an empty frame, as before
    val row = base.agg(aggs.head, aggs.tail: _*).filter(col("_n") > 0)
    val structs = metrics.zipWithIndex.map { case ((name, k, _), i) =>
      struct(lit(name).as("metric"), lit(k).as("k"),
        col(s"_v$i").as("value"), col("_n").as("n_queries"))
    }
    row.select(explode(array(structs: _*)).as("m"))
      .select(col("m.metric").as("metric"), col("m.k").as("k"),
        col("m.value").as("value"), col("m.n_queries").as("n_queries"))
  }

  /** Paired significance between two rankers over the same query panel
    * — the statistical guard every "ranker B beats ranker A" claim
    * needs (Smucker, Allan & Carterette, CIKM 2007: the paired t-test
    * is the recommended test for per-query IR metric deltas; the
    * sign-test win/loss/tie counts ride along). Both runs evaluate
    * through [[perQuery]] on ONE metric; per-query values quantize to
    * a 1e-6 integer grid FIRST, so every sum below is an exact BIGINT
    * — aggregation-order-independent on any engine at any scale — and
    * the t statistic computes from those exact sums in one fixed-order
    * expression: t = mean(d) / sqrt(var(d)/n), var the n−1 sample
    * variance (a zero-variance panel reports t = 0). Runs:
    * (query_id, rank, doc_id); one output row: (n_queries, mean_a,
    * mean_b, mean_delta, t_stat, wins, losses, ties). */
  def pairedSignificance(runA: DataFrame, runB: DataFrame,
      qrels: DataFrame, metric: String = "ndcg",
      k: Int = 10): DataFrame = {
    def vals(run: DataFrame, out: String) =
      perQuery(run, qrels, Seq(k))
        .filter(col("metric") === metric)
        .select(col("query_id"),
          round(col("value") * 1e6, 0).cast("long").as(out))
    val d = vals(runA, "qa").join(vals(runB, "qb"), "query_id")
      .withColumn("d", col("qa") - col("qb"))
    val sums = d.agg(count(lit(1)).as("n"),
      sum("qa").as("sa"), sum("qb").as("sb"), sum("d").as("sd"),
      sum(col("d") * col("d")).as("sdd"),
      sum(when(col("d") > 0, 1).otherwise(0)).as("wins"),
      sum(when(col("d") < 0, 1).otherwise(0)).as("losses"),
      sum(when(col("d") === 0, 1).otherwise(0)).as("ties"))
    val nD = col("n").cast("double")
    val sdD = col("sd").cast("double")
    val varD = (col("sdd").cast("double") - sdD * sdD / nD) / (nD - 1)
    sums.select(col("n").as("n_queries"),
      (col("sa").cast("double") / 1e6 / nD).as("mean_a"),
      (col("sb").cast("double") / 1e6 / nD).as("mean_b"),
      (sdD / 1e6 / nD).as("mean_delta"),
      when(varD > 0, (sdD / nD) / sqrt(varD / nD))
        .otherwise(lit(0.0)).as("t_stat"),
      col("wins"), col("losses"), col("ties"))
  }
}
