package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering and the
  * zone-map skipping audit that JUSTIFIES a layout choice with a
  * number instead of folklore.
  *
  * At 100 TB the dominant query cost is the scan, and the dominant
  * scan optimization is skipping whole files via their min/max
  * footer stats (parquet row groups, Delta/Iceberg file pruning). A
  * single-column sort clusters perfectly on that column and not at
  * all on any other; interleaving the bits of two bucketized
  * dimensions (Morton order — the public Z-order technique every
  * lakehouse OPTIMIZE implements) buys bounded min/max ranges on BOTH.
  * [[skippingAudit]] measures the effect directly: lay the rows out,
  * cut them into equal "files", build each file's zone map, and count
  * the files a range predicate provably cannot touch.
  *
  * Scale shape: the layout rank is [[Sampling.globalRank]] (relational
  * zipWithIndex — one range shuffle, bounded offsets collect, no
  * corpus-wide window); zone maps are one groupBy over file ids; the
  * audit joins the FILES relation (bounded: n_files rows) against a
  * literal predicate relation. Nothing after the rank touches
  * corpus-sized data.
  */
object Layout {

  /** Morton interleave of two pre-bucketized dimensions (values must
    * be in [0, 2^bits)): bit i of x lands at position 2i, bit i of y
    * at 2i+1. Pure integer arithmetic — replayable in any engine. */
  def zorderKey2(xBucket: Column, yBucket: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bad bits: $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(xBucket, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yBucket, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** One rectangle predicate over (x, y); `None` = unconstrained. */
  final case class RangePred(name: String, loX: Option[Double],
      hiX: Option[Double], loY: Option[Double], hiY: Option[Double])

  /** Zone-map skipping audit for ONE layout: rows ranked by
    * `layoutKeys` are cut into `nFiles` equal files; each file's
    * (min, max) of `xCol`/`yCol` is its zone map; a file is SKIPPED
    * for a predicate when its box provably misses the predicate's
    * rectangle. Output: (layout, predicate, n_files, n_skipped,
    * skip_frac). */
  def skippingAudit(df: DataFrame, layout: String,
                    layoutKeys: Seq[String], xCol: String, yCol: String,
                    nFiles: Int, preds: Seq[RangePred]): DataFrame = {
    require(nFiles >= 1 && preds.nonEmpty, s"bad spec: $nFiles/$preds")
    val ranked = Sampling.globalRank(df, layoutKeys, "position")
    val withN = ranked.crossJoin(
      broadcast(ranked.agg(count(lit(1)).as("_n"))))
    // products stay far below 2^53: exact double floor, replayable
    val files = withN
      .withColumn("file",
        floor(col("position") * nFiles.toDouble / col("_n")))
    auditZoneMaps(fileZoneMaps(files, "file", xCol, yCol), layout, preds)
  }

  /** Per-file zone maps: (fileCol, min/max of x and y) — the min/max
    * footer statistics a parquet file or lakehouse manifest would
    * carry, derived from any relation that declares its file
    * assignment (a simulated cut or a real on-disk partition column). */
  def fileZoneMaps(df: DataFrame, fileCol: String, xCol: String,
                   yCol: String): DataFrame =
    df.groupBy(col(fileCol).as("file"))
      .agg(min(col(xCol).cast("double")).as("min_x"),
        max(col(xCol).cast("double")).as("max_x"),
        min(col(yCol).cast("double")).as("min_y"),
        max(col(yCol).cast("double")).as("max_y"))

  /** Score `preds` against a zone-map relation (from [[fileZoneMaps]]):
    * a file is skipped when its box provably misses the predicate's
    * rectangle. The zone relation is files-sized — everything here is
    * bounded by file counts, never row counts. */
  def auditZoneMaps(zones: DataFrame, layout: String,
                    preds: Seq[RangePred]): DataFrame = {
    require(preds.nonEmpty, "no predicates")
    val spark = zones.sparkSession
    import spark.implicits._
    val predDf = broadcast(preds
      .map(p => (p.name, p.loX, p.hiX, p.loY, p.hiY))
      .toDF("predicate", "lo_x", "hi_x", "lo_y", "hi_y"))
    def overlaps(lo: String, hi: String, mn: String, mx: String) =
      (col(lo).isNull || col(mx) >= col(lo)) &&
        (col(hi).isNull || col(mn) <= col(hi))
    zones.crossJoin(predDf)
      .withColumn("skipped",
        !(overlaps("lo_x", "hi_x", "min_x", "max_x") &&
          overlaps("lo_y", "hi_y", "min_y", "max_y")))
      .groupBy("predicate")
      .agg(count(lit(1)).as("n_files"),
        sum(col("skipped").cast("long")).as("n_skipped"))
      .select(lit(layout).as("layout"), col("predicate"),
        col("n_files"), col("n_skipped"),
        round(col("n_skipped").cast("double") / col("n_files"), 6)
          .as("skip_frac"))
  }
}
