package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Benchmark-dataset ingestion (SURVEY.md §1.1 "Benchmark dataset"):
  * parse uploaded JSON judgments into (query, doc_ref, grade) rows with
  * the reference's normalization rules
  * (webui/services/benchmark_dataset_service.py:118-170):
  *  - doc_ref may be a plain string or an object carrying `uri`
  *  - relevance_grade defaults to 2 when missing
  *  - grades clamp to [0, 3]
  * JSON handling is `from_json` schema-on-read over a string column —
  * the same pattern the engine uses for every free-form `meta` JSON
  * payload (§1.2). The two possible doc_ref shapes are read with two
  * schemas in PERMISSIVE mode (the mismatched field nulls out) and
  * coalesced by array position.
  */
object BenchmarkDatasets {

  private val strRefSchema = ArrayType(StructType(Seq(
    StructField("doc_ref", StringType),
    StructField("relevance_grade", IntegerType))))
  private val objRefSchema = ArrayType(StructType(Seq(
    StructField("doc_ref", StructType(Seq(StructField("uri", StringType)))),
    StructField("relevance_grade", IntegerType))))

  /** Parse one dataset upload: rows of
    * (query_id, query_text, judgments_json) where judgments_json is a
    * JSON array of {doc_ref: string|{uri}, relevance_grade?: int}.
    * Output: (query_id, query_text, doc_ref, grade). */
  def parseJudgments(uploads: DataFrame,
                     jsonCol: String = "judgments_json"): DataFrame = {
    val both = uploads.select(
      col("query_id"), col("query_text"),
      posexplode(from_json(col(jsonCol), strRefSchema))
        .as(Seq("idx", "s")))
      .join(
        uploads.select(col("query_id"),
          posexplode(from_json(col(jsonCol), objRefSchema))
            .as(Seq("idx", "o"))),
        Seq("query_id", "idx"))
    both.select(
        col("query_id"), col("query_text"),
        coalesce(col("o.doc_ref.uri"), col("s.doc_ref")).as("doc_ref"),
        least(greatest(
          coalesce(col("s.relevance_grade"), lit(2)), // default grade 2
          lit(0)), lit(3)).as("grade")) // clamp 0..3 (service.py:160-168)
      .filter(col("doc_ref").isNotNull)
  }
}
