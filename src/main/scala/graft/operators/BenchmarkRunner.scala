package graft.operators

import org.apache.spark.sql.DataFrame
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
    * corpus term weights and the exploded query terms. */
  def sparseRuns(chunks: DataFrame, queries: DataFrame, k: Int,
                 p: Bm25.Params = Bm25.Default): DataFrame = {
    val idx = Bm25.buildIndex(chunks, "chunk_id", "content", p)
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
      .agg(sum(col("weight") * col("q_weight")).as("score"))
      .withColumnRenamed("id", "chunk_id")
    val withDoc = scored.join(
      chunks.select("chunk_id", "doc_id"), "chunk_id")
      .select("query_id", "doc_id", "chunk_id", "score")
    TopK.perGroup(withDoc, "query_id", k)
      .select("query_id", "rank", "doc_id", "chunk_id", "score")
  }

  /** Hybrid: RRF-fuse the two legs per query. */
  def hybridRuns(chunks: DataFrame, queries: DataFrame, k: Int, dim: Int,
                 rrfK: Int = Rrf.DefaultRrfK): DataFrame = {
    val d = denseRuns(chunks, queries, k, dim)
      .select("query_id", "chunk_id", "doc_id", "score")
    val s = sparseRuns(chunks, queries, k)
      .select("query_id", "chunk_id", "doc_id", "score")
    // fused is ≤ |Q|·2k rows — broadcast it against the chunks table so
    // the doc_id enrichment never shuffles the big side
    val fused = Rrf.fuse(
      d.drop("doc_id"), s.drop("doc_id"), "chunk_id", "score", k, rrfK,
      queryCol = Some("query_id"))
    val withDoc = chunks.select("chunk_id", "doc_id")
      .join(broadcast(fused), "chunk_id")
      .select("query_id", "doc_id", "chunk_id", "score")
    TopK.perGroup(withDoc, "query_id", k)
      .select("query_id", "rank", "doc_id", "chunk_id", "score")
  }

  /** Full benchmark: runs → first-hit doc collapse (W6) → per-query +
    * macro metrics (A5/J6). Returns (metric, k, value, n_queries). */
  def evaluate(chunks: DataFrame, queries: DataFrame, qrels: DataFrame,
               mode: String = "hybrid", k: Int = 20, dim: Int = 64,
               kValues: Seq[Int] = IrMetrics.DefaultKValues): DataFrame = {
    val runs = mode match {
      case "dense" => denseRuns(chunks, queries, k, dim)
      case "sparse" => sparseRuns(chunks, queries, k)
      case "hybrid" => hybridRuns(chunks, queries, k, dim)
      case other => throw new IllegalArgumentException(s"mode $other")
    }
    // the runs relation is <= |Q|*k rows but its DAG is the whole
    // retrieval pipeline — pin it before the metric fan-out
    val docRuns = IrMetrics.collapseToDocs(
      runs.select("query_id", "rank", "doc_id")).cache()
    IrMetrics.macroAveraged(docRuns, qrels, kValues)
  }
}
