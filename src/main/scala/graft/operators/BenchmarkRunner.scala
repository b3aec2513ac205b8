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
    val withDoc = scored.join(
      chunks.select("chunk_id", "doc_id"), "chunk_id")
      .select("query_id", "doc_id", "chunk_id", "score")
    TopK.perGroup(withDoc, "query_id", k)
      .select("query_id", "rank", "doc_id", "chunk_id", "score")
  }

  /** Hybrid: RRF-fuse the two legs per query. Both legs already emit
    * dense 1..k ranks ordered (score desc, chunk_id) — exactly the
    * ranks RRF needs. The leg merge is union + one max-aggregation on
    * (query_id, chunk_id) — an outer join cannot broadcast, so it would
    * shuffle and sort BOTH candidate lists — and the final per-query
    * ranking reuses the bounded [[TopK]] aggregator instead of a rank
    * window, so fusion costs two bounded exchanges total and never
    * sorts more than 2k candidates per query. */
  def hybridRuns(chunks: DataFrame, queries: DataFrame, k: Int, dim: Int,
                 rrfK: Int = Rrf.DefaultRrfK,
                 index: Option[Bm25.Index] = None): DataFrame = {
    val nullI = lit(null).cast("int")
    val d = denseRuns(chunks, queries, k, dim)
      .select(col("query_id"), col("chunk_id"), col("doc_id"),
        col("rank").cast("int").as("_dense_rank"), nullI.as("_sparse_rank"))
    val s = sparseRuns(chunks, queries, k, index = index)
      .select(col("query_id"), col("chunk_id"), col("doc_id"),
        nullI.as("_dense_rank"), col("rank").cast("int").as("_sparse_rank"))
    val fused = d.unionByName(s)
      .groupBy("query_id", "chunk_id")
      .agg(max("doc_id").as("doc_id"), // doc is a function of chunk_id
        min("_dense_rank").as("_dense_rank"), // best rank if dups ever
        min("_sparse_rank").as("_sparse_rank"))
      .withColumn("score",
        coalesce(lit(1.0) / (lit(rrfK) + col("_dense_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("_sparse_rank")), lit(0.0)))
      .select("query_id", "doc_id", "chunk_id", "score")
    TopK.perGroup(fused, "query_id", k)
      .select("query_id", "rank", "doc_id", "chunk_id", "score")
  }

  /** Full benchmark: runs → first-hit doc collapse (W6) → per-query +
    * macro metrics (A5/J6). Returns (metric, k, value, n_queries). */
  def evaluate(chunks: DataFrame, queries: DataFrame, qrels: DataFrame,
               mode: String = "hybrid", k: Int = 20, dim: Int = 64,
               kValues: Seq[Int] = IrMetrics.DefaultKValues): DataFrame = {
    // the BM25 stats relation feeds BOTH the query-term weighting and
    // the doc-weight computation — pin it (single partition: it's the
    // vocabulary, tiny next to the corpus) so the index aggregation
    // runs once per batch. docWeights has exactly one consumer; caching
    // it would only force a fixed partitioning on the scoring join.
    val idx = if (mode == "dense") None
      else Some(Bm25.buildIndex(chunks, "chunk_id", "content",
        pinStats = true))
    val runs = mode match {
      case "dense" => denseRuns(chunks, queries, k, dim)
      case "sparse" => sparseRuns(chunks, queries, k, index = idx)
      case "hybrid" => hybridRuns(chunks, queries, k, dim, index = idx)
      case other => throw new IllegalArgumentException(s"mode $other")
    }
    // the runs relation is <= |Q|*k rows BY CONSTRUCTION but its DAG is
    // the whole retrieval pipeline — pin it (in ONE partition: bounded
    // tiny, and the metric windows/aggs then run single-task) before
    // the fan-out. qrels feeds both the graded join and the ideal-DCG
    // branch — cache it so its scan runs once, but KEEP its
    // partitioning: judgment sets scale with the corpus, so no
    // single-partition coalesce here
    val docRuns = IrMetrics.collapseToDocs(
      runs.select("query_id", "rank", "doc_id")).coalesce(1).cache()
    val qrelsPinned = qrels.cache()
    IrMetrics.macroAveraged(docRuns, qrelsPinned, kValues)
  }
}
