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
}
