package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Catalog/maintenance operators: orphan cleanup, collection counters,
  * chunk stats, doc-ref resolution — the reference's background jobs
  * re-expressed as single declarative plans.
  */
object Maintenance {

  /** J5: vector/chunk rows whose doc no longer exists — a left-anti
    * join, the set-based form of the reference's per-point scroll
    * (vecpipe/maintenance.py:175-302). At scale this is one shuffle on
    * doc_id; with Delta it becomes
    * `MERGE ... WHEN NOT MATCHED BY SOURCE THEN DELETE`. */
  def orphanVectors(vectors: DataFrame, documents: DataFrame,
                    docIdCol: String = "doc_id"): DataFrame =
    vectors.join(documents.select(docIdCol).distinct(),
      Seq(docIdCol), "left_anti")

  /** E4: orphaned collections = existing − active
    * (vecpipe/maintenance.py:239-302). */
  def orphanCollections(existing: DataFrame, active: DataFrame,
                        nameCol: String = "collection_id"): DataFrame =
    existing.select(nameCol).except(active.select(nameCol))

  /** A7: per-collection counters maintained as a materialized view
    * (models.py:281-288; webui/tasks/cleanup.py:125-160). */
  def collectionCounters(chunks: DataFrame): DataFrame =
    chunks.groupBy("collection_id").agg(
      countDistinct("doc_id").as("document_count"),
      count("*").as("chunks_total_count"),
      sum(length(col("content"))).as("total_size_bytes"),
      sum(when(col("vector").isNotNull, 1).otherwise(0)).as("vector_count"))

  /** A6: chunk stats for one execution
    * (executor_types.py ChunkStats.from_token_counts). */
  def chunkStats(chunks: DataFrame, tokenCol: String = "token_count"): DataFrame =
    chunks.agg(
      min(tokenCol).as("min_tokens"),
      max(tokenCol).as("max_tokens"),
      avg(tokenCol).as("avg_tokens"),
      sum(tokenCol).as("total_tokens"),
      count("*").as("n_chunks"))

  /** REMOVE_SOURCE operation (models.py:97-146 op type `remove_source`;
    * dispatched webui/tasks/ingestion.py:391-412): drop one source's
    * documents from a collection, keeping only vector/chunk rows whose
    * doc survives — the doc filter plus ONE semi-join on doc_id, the
    * set-based form of the reference's per-document delete loop. */
  def removeSource(documents: DataFrame, vectors: DataFrame,
                   source: String, sourceCol: String = "source",
                   docIdCol: String = "doc_id"): DataFrame = {
    val survivors = documents.filter(col(sourceCol) =!= source)
    vectors.join(survivors.select(docIdCol).distinct(),
      Seq(docIdCol), "left_semi")
  }

  /** J8: resolve benchmark doc_refs (uri or path) to document ids with
    * a match-status column (benchmark_dataset_service.py:49-117,734-780). */
  def resolveDocRefs(refs: DataFrame, documents: DataFrame,
                     refCol: String = "doc_ref",
                     uriCol: String = "uri"): DataFrame =
    refs.join(documents.select(col(uriCol).as(refCol), col("doc_id")),
        Seq(refCol), "left")
      .withColumn("match_status",
        when(col("doc_id").isNotNull, lit("matched"))
          .otherwise(lit("unmatched")))

  /** Sparse-index health report — the `_stats`/`_segments` readout
    * every search deployment watches (postings skew decides sharding;
    * df percentiles decide stopword/prune policy): corpus size, vocab
    * size, postings count, token total, avgdl, the heaviest df and
    * its p50/p90 over the vocabulary. One tokenize pass feeding two
    * Zipf-bounded aggregations; the df percentiles ride
    * [[Sampling.exactQuantiles]]'s two-phase distributed rank (never a
    * whole-vocab window). avgdl is an exact integer ratio —
    * engine-order-independent. Output: (metric, value) rows. */
  def indexStats(docs: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    import graft.functions.TextFunctions
    val toks = docs.select(col(idCol).as("id"),
      explode(TextFunctions.tokensCol(col(textCol))).as("term"))
    val lens = docs.select(
      size(TextFunctions.tokensCol(col(textCol))).cast("long").as("len"))
    val dfRel = toks.distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val corpus = lens.agg(count(lit(1)).as("n_docs"),
        sum("len").as("total_tokens"))
      .select(
        col("n_docs").cast("double").as("n_docs"),
        col("total_tokens").cast("double").as("total_tokens"),
        (col("total_tokens").cast("double") /
          col("n_docs").cast("double")).as("avgdl"))
    val vocab = dfRel.agg(count(lit(1)).as("vocab_size"),
        sum("df").as("n_postings"), max("df").as("max_df"))
      .select(col("vocab_size").cast("double").as("vocab_size"),
        col("n_postings").cast("double").as("n_postings"),
        col("max_df").cast("double").as("max_df"))
    def rows(src: DataFrame, names: Seq[String]) = names.map(n =>
      src.select(lit(n).as("metric"), col(n).cast("double").as("value")))
    val qs = Sampling.exactQuantiles(dfRel, "df", Seq(0.5, 0.9))
      .select(concat(lit("df_p"),
          (col("q") * 100).cast("int").cast("string")).as("metric"),
        col("value"))
    (rows(corpus, Seq("n_docs", "total_tokens", "avgdl")) ++
      rows(vocab, Seq("vocab_size", "n_postings", "max_df")))
      .reduce(_ unionByName _).unionByName(qs)
  }
}
