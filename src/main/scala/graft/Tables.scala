package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Every table is a single parquet file under the scale-factor dir; at
  * cluster scale these would be directory-partitioned datasets — the
  * loader is the only place that assumption lives, so swapping a path
  * for a partitioned table root changes nothing downstream.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS), which Spark 4 rejects by default;
    // read it as a nanos-since-epoch long (ordering-compatible with
    // DuckDB's TIMESTAMP_NS, which the oracle sees)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register all tables as temp views so spark.sql(...) mirrors the
    * DuckDB oracle's naming. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
