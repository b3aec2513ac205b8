package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}

/** Int8 scalar quantization of embedding columns — the reference
  * exposes int8 as a collection-level vector/model quantization option
  * (shared/database/models.py:261, qwen3_search_config.py:54-69); here
  * it is a real storage/scoring path: 4× smaller vectors with
  * per-dimension symmetric scales.
  *
  *  - fit: per-dimension max|x| over the corpus — one aggregation,
  *    d rows to the driver.
  *  - encode: code_i = clamp(floor(x_i / s_i * 127 + 0.5), ±127).
  *    floor(x + 0.5) rather than round(): both engines evaluate the
  *    identical IEEE expression, so the oracle is bit-stable even at
  *    representability edges (round() implementations differ).
  *  - score: the query folds its half of the dequantization into a
  *    driver-side weight vector w_i = q_i · s_i / 127, so scoring is
  *    one codegen'd integer-array dot product per row.
  */
object Quant {

  /** Per-dimension symmetric scales: max|x|, 1.0 for all-zero dims. */
  def fitInt8(vectors: DataFrame, vecCol: String, dim: Int): Array[Double] = {
    val rows = vectors
      .select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy("pos").agg(max(abs(col("v").cast("double"))).as("s"))
      .collect()
    require(rows.forall(_.getInt(0) < dim),
      s"fitInt8: vectors longer than declared dim=$dim " +
        s"(saw position ${rows.map(_.getInt(0)).max})")
    val scales = Array.fill(dim)(1.0)
    rows.foreach { r =>
      val s = r.getDouble(1)
      if (s > 0.0) scales(r.getInt(0)) = s
    }
    scales
  }

  /** codes array<int> via an element-wise transform over the scales. */
  def encodeInt8(vecCol: Column, scales: Array[Double]): Column = {
    val s = array(scales.toIndexedSeq.map(lit): _*)
    zip_with(vecCol, s, (v, sc) =>
      greatest(lit(-127), least(lit(127),
        floor(v.cast("double") / sc * 127.0 + 0.5).cast("int"))))
  }

  /** Approximate dot-product top-k over int8 codes: one codegen'd dot
    * against the dequantization-folded query weights. */
  def int8TopK(vectors: DataFrame, idCol: String, vecCol: String,
               query: Array[Double], k: Int,
               scales: Array[Double]): DataFrame = {
    val w = query.indices.map(i => query(i) * scales(i) / 127.0).toArray
    val encoded =
      if (vectors.columns.contains("codes")) vectors
      else vectors.withColumn("codes", encodeInt8(col(vecCol), scales))
    encoded
      .withColumn("ascore",
        V.dot(col("codes").cast("array<double>"),
          array(w.toIndexedSeq.map(lit): _*)))
      .select(col(idCol), col("ascore"))
      .orderBy(col("ascore").desc, col(idCol))
      .limit(k)
  }
}
