package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism floor for CPU-heavy narrow pipelines over small scans.
  *
  * Problem class (measured, r7): the synthetic sf0.1 tables are
  * single-row-group parquet files, so their scans arrive in 1-2
  * partitions and everything FUSED into the scan stage — tokenize,
  * shingle explode, a 16-way sha MinHash family — runs serialized on
  * one core of a 32-core host (e.g. the edit-distance dedup's
  * candidate build: a 2.8 s single-task stage). At production scale
  * the same scans have thousands of row groups and the fused work is
  * already parallel.
  *
  * [[floor]] is the condition-gated adapter: when (and only when) the
  * physical scan parallelism is below the session default, round-robin
  * repartition BEFORE the heavy per-row work. The gate reads the
  * pre-execution partition count, so on any production-scale input it
  * is false and NO exchange is added — the helper is inert exactly
  * where an extra corpus shuffle would be a real cost.
  */
object Par {

  /** Round-robin repartition to the session default parallelism iff
    * the relation currently has fewer partitions; identity otherwise
    * (and always for streaming relations, whose partitioning the
    * micro-batch engine owns). */
  def floor(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }
}
