package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}

/** Batch IR benchmark execution (SURVEY.md §1.1 "Benchmark dataset",
  * A5 + J6 + W6): run EVERY query of a dataset against a chunks table
  * in one distributed plan, collapse chunk hits to docs, grade with
  * qrels, and macro-average the metrics.
  *
  * The reference loops queries through HTTP search calls
  * (webui/services/benchmark_executor.py); the Spark-native form is a
  * single query×chunk plan — dense scores via the mock-embedding column
  * arithmetic applied to the QUERY side too (no driver loop, no
  * collect), sparse scores via one exploded-terms join, ranks via
  * windows partitioned by query_id.
  *
  * Scale: |Q| queries ride a broadcast; chunk-side work is one scan per
  * leg. The query×chunk product is scored inside the narrow scan stage
  * and reduced to per-partition top-k buffers by [[TopK.perGroup]]
  * before any exchange — no full-product shuffle at any corpus size.
  */
object BenchmarkRunner {

  /** Dense leg for all queries at once: broadcast the embedded queries,
    * score every (query, chunk) pair with the codegen dot product, keep
    * top-k per query via [[TopK.perGroup]] — the scored cross product
    * stays inside the narrow scan stage; only ≤ |parts|·|Q|·k candidate
    * rows ever cross an exchange. Chunk vectors must be L2-normalized. */
  def denseRuns(chunks: DataFrame, queries: DataFrame, k: Int,
                dim: Int): DataFrame = {
    val q = broadcast(queries.select(col("query_id"),
      TextFunctions.mockEmbeddingCol(col("query_text"), dim).as("q_vec")))
    val scored = chunks.crossJoin(q)
      .withColumn("score", VectorFunctions.dot(col("vector"), col("q_vec")))
      .select("query_id", "doc_id", "chunk_id", "score")
    TopK.perGroup(scored, "query_id", k)
      .select("query_id", "rank", "doc_id", "chunk_id", "score")
  }

  /** Sparse (BM25) leg for all queries at once: one join between the
    * corpus term weights and the exploded query terms. Pass a prebuilt
    * (cached) `index` to amortize the corpus indexing across legs and
    * runs. */
  def sparseRuns(chunks: DataFrame, queries: DataFrame, k: Int,
                 p: Bm25.Params = Bm25.Default,
                 index: Option[Bm25.Index] = None): DataFrame = {
    val idx = index.getOrElse(
      Bm25.buildIndex(chunks, "chunk_id", "content", p))
    val docW = idx.docWeights
    val stats = idx.stats
    val qTerms = queries.select(col("query_id"),
        explode(TextFunctions.tokensCol(col("query_text"))).as("term"))
      .groupBy("query_id", "term").agg(count("*").as("q_tf"))
      .join(stats.select("term", "idf"), "term")
      .filter(col("idf") > 0.0)
      .withColumn("q_weight", col("q_tf").cast("double") * col("idf"))
    val scored = docW.join(broadcast(qTerms.select("query_id", "term", "q_weight")), "term")
      .groupBy("query_id", "id")
      // canonical term-ordered float sum — see Bm25.sparseScore
      .agg(Bm25.sparseScore(col("weight") * col("q_weight"), col("term"))
        .as("score"))
      .withColumnRenamed("id", "chunk_id")
    // doc_id joins in AFTER top-k: the candidate relation is corpus-
    // sized (every chunk sharing a query term), the top-k result is
    // ≤ |Q|·k rows — so the doc lookup broadcasts the RESULT against
    // one chunks scan instead of shuffling candidates. Rank order
    // depends only on (score, chunk_id), so the deferred join cannot
    // perturb it.
    val top = TopK.perGroup(
      scored.withColumn("doc_id", col("chunk_id")), "query_id", k)
    broadcast(top.select("query_id", "rank", "chunk_id", "score"))
      .join(chunks.select("chunk_id", "doc_id"), "chunk_id")
      .select("query_id", "rank", "doc_id", "chunk_id", "score")
  }

  /** Hybrid: RRF-fuse the two legs per query. Both legs already emit
    * dense 1..k ranks ordered (score desc, chunk_id) — exactly the
    * ranks RRF needs — so a query's ENTIRE fusion input is ≤ 2k rows by
    * construction. Fusion is therefore ONE exchange: groupBy(query_id)
    * collects the ≤2k hits into an array, and the chunk-merge (min rank
    * per chunk across legs), RRF scoring, (score desc, chunk_id) sort
    * and k-slice all run as per-row array ops — where a
    * groupBy(query_id, chunk_id) + per-query top-k would cost two
    * exchanges, and an outer join of the legs cannot broadcast. The
    * in-array merge is O((2k)²) per query on k ≤ a few hundred —
    * negligible next to an exchange, and independent of corpus size. */
  def hybridRuns(chunks: DataFrame, queries: DataFrame, k: Int, dim: Int,
                 rrfK: Int = Rrf.DefaultRrfK,
                 index: Option[Bm25.Index] = None): DataFrame = {
    fusedHits(chunks, queries, k, dim, rrfK, index)
      .select(col("query_id"), posexplode(col("top")).as(Seq("_pos", "_h")))
      .select(col("query_id"), (col("_pos") + 1).cast("int").as("rank"),
        col("_h.doc_id").as("doc_id"), col("_h.chunk_id").as("chunk_id"),
        col("_h.score").as("score"))
  }

  /** The fused per-query top-k as ONE array row per query:
    * (query_id, top) with `top` ordered by (score desc, chunk_id).
    * [[hybridRuns]] explodes it; [[evaluate]] consumes the array
    * directly so the W6 doc collapse costs no further exchange. */
  private def fusedHits(chunks: DataFrame, queries: DataFrame, k: Int,
                        dim: Int, rrfK: Int,
                        index: Option[Bm25.Index]): DataFrame = {
    val nullI = lit(null).cast("int")
    val d = denseRuns(chunks, queries, k, dim)
      .select(col("query_id"), col("chunk_id"), col("doc_id"),
        col("rank").cast("int").as("_dense_rank"), nullI.as("_sparse_rank"))
    val s = sparseRuns(chunks, queries, k, index = index)
      .select(col("query_id"), col("chunk_id"), col("doc_id"),
        nullI.as("_dense_rank"), col("rank").cast("int").as("_sparse_rank"))
    val hits = d.unionByName(s)
      .groupBy("query_id")
      .agg(collect_list(struct(col("chunk_id"), col("doc_id"),
        col("_dense_rank"), col("_sparse_rank"))).as("hs"))
    // first occurrence of each chunk_id survives; its ranks are the
    // per-leg minima over all entries for that chunk (array_min skips
    // the null rank of the leg that missed it)
    val firsts = filter(col("hs"), (x, i) =>
      !exists(slice(col("hs"), lit(1), i),
        y => y.getField("chunk_id") === x.getField("chunk_id")))
    val scoredArr = transform(firsts, x => {
      val same = filter(col("hs"),
        y => y.getField("chunk_id") === x.getField("chunk_id"))
      val dmin = array_min(transform(same, y => y.getField("_dense_rank")))
      val smin = array_min(transform(same, y => y.getField("_sparse_rank")))
      val score =
        coalesce(lit(1.0) / (lit(rrfK) + dmin), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + smin), lit(0.0))
      // leading negated score makes the ascending struct sort emit
      // (score desc, chunk_id asc) — the TopK contract; RRF scores are
      // strictly positive so the negation cannot hit -0.0 ties
      struct((-score).as("_ns"), x.getField("chunk_id").as("chunk_id"),
        x.getField("doc_id").as("doc_id"), score.as("score"))
    })
    hits.select(col("query_id"),
      slice(sort_array(scoredArr), 1, k).as("top"))
  }

  /** Full benchmark: runs → first-hit doc collapse (W6) → per-query +
    * macro metrics (A5/J6). Returns (metric, k, value, n_queries). */
  def evaluate(chunks: DataFrame, queries: DataFrame, qrels: DataFrame,
               mode: String = "hybrid", k: Int = 20, dim: Int = 64,
               kValues: Seq[Int] = IrMetrics.DefaultKValues,
               index: Option[Bm25.Index] = None): DataFrame = {
    // the BM25 stats relation feeds BOTH the query-term weighting and
    // the doc-weight computation — pin it (single partition: it's the
    // vocabulary, tiny next to the corpus) so the index aggregation
    // runs once per batch. docWeights has exactly one consumer; caching
    // it would only force a fixed partitioning on the scoring join.
    // Callers holding the collection's STANDING index pass it instead.
    val idx = if (mode == "dense") None
      else index.orElse(Some(Bm25.buildIndex(chunks, "chunk_id", "content",
        pinStats = true)))
    // each query's collapsed doc ranking stays ONE array row end to
    // end: the hybrid path holds a sorted array straight out of its
    // fusion exchange (the W6 collapse runs inside it, no further
    // exchange), the single-leg paths re-group once through
    // collapseToDocArrays — and the zero-window metric fan-out then
    // costs one grade-map join plus one global aggregation
    // (macroAveragedFromArrays). The ≤|Q|-row relation coalesces to a
    // single partition so the metric stage is one task; it has exactly
    // one consumer, so no cache. qrels folds into per-query grade maps
    // inside macroAveragedFromArrays — one scan, no cache needed.
    val docsArr = mode match {
      case "hybrid" =>
        fusedHits(chunks, queries, k, dim, Rrf.DefaultRrfK, idx)
          .select(col("query_id"),
            transform(IrMetrics.collapseHits(col("top")),
              h => h.getField("doc_id")).as("docs"))
      case "dense" => IrMetrics.collapseToDocArrays(
        denseRuns(chunks, queries, k, dim)
          .select("query_id", "rank", "doc_id"))
      case "sparse" => IrMetrics.collapseToDocArrays(
        sparseRuns(chunks, queries, k, index = idx)
          .select("query_id", "rank", "doc_id"))
      case other => throw new IllegalArgumentException(s"mode $other")
    }
    IrMetrics.macroAveragedFromArrays(docsArr.coalesce(1), qrels, kValues)
  }
}
