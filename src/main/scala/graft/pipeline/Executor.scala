package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Execution-result telemetry (T4 counter semantics; ref
  * shared/pipeline/executor_types.py:200-246 ExecutionResult): the
  * per-run summary the reference assembles imperatively while looping
  * files — files_processed / succeeded / failed / skipped and
  * chunks_created — expressed as ONE relational aggregation over a
  * per-file outcome relation, so it runs at any corpus size with a
  * map-side-combined groupBy and no driver loop.
  *
  * The reference's invariant (`succeeded + failed + skipped <=
  * files_processed`, executor_types.py:243-246) holds here BY
  * CONSTRUCTION when `status` is single-valued per row; [[validated]]
  * additionally surfaces rows violating the outcome partition (unknown
  * status values), mirroring its ValueError.
  *
  * The Redis/WebSocket event transport around these counters is
  * declared out of scope (SURVEY.md §0) — the streaming-side carrier is
  * [[graft.streaming.Progress.Recorder]].
  */
object Executor {

  val Statuses: Seq[String] = Seq("succeeded", "failed", "skipped")

  /** Aggregate ExecutionResult counters per collection from a per-file
    * relation with columns (collectionCol, status, chunks). `chunks`
    * counts only toward succeeded files (a failed parse creates none —
    * executor_types.py:215). */
  def executionStats(files: DataFrame,
                     collectionCol: String = "collection_id"): DataFrame =
    files.groupBy(col(collectionCol))
      .agg(
        count(lit(1)).as("files_processed"),
        sum(when(col("status") === "succeeded", 1L).otherwise(0L))
          .as("files_succeeded"),
        sum(when(col("status") === "failed", 1L).otherwise(0L))
          .as("files_failed"),
        sum(when(col("status") === "skipped", 1L).otherwise(0L))
          .as("files_skipped"),
        sum(when(col("status") === "succeeded", col("chunks"))
          .otherwise(0L)).as("chunks_created"))

  /** Rows whose status falls outside the outcome partition — the
    * relational twin of ExecutionResult's post-init ValueError. */
  def invalidOutcomes(files: DataFrame): DataFrame =
    files.filter(!col("status").isin(Statuses: _*))
}
