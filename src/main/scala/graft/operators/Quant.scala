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

  // -------------------------------------------------------------------
  // BINARY quantization — the 32× compression tier below int8 (the
  // production BQ path: Qdrant/Faiss expose exactly this shape): bit i
  // = sign(v_i), distance = Hamming via popcount, a Hamming shortlist
  // re-ranked exact. 1 − h/d is a monotone proxy for cosine on
  // roughly-normalized vectors; the refine stage restores exact order.
  // -------------------------------------------------------------------

  /** Sign-bit pack of a vector column into ⌈dim/32⌉ LONG words of 32
    * bits each (32, not 64: bit 63 would need 1L<<63 = Long.MinValue,
    * whose overflow semantics are not worth cross-engine risk; the
    * popcount cost is identical). Word w bit j = (v[32w+j] >= 0). */
  def packBits(vecCol: Column, dim: Int): Column = {
    require(dim >= 1, s"bad dim: $dim")
    val words = (dim + 31) / 32
    array((0 until words).map { w =>
      (0 until math.min(32, dim - 32 * w)).map { j =>
        when(element_at(vecCol, 32 * w + j + 1).cast("double") >= 0.0,
          lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
  }

  /** Driver-side pack of a query vector, same layout. */
  def packBitsLocal(q: Array[Double]): Array[Long] = {
    val words = (q.length + 31) / 32
    val out = new Array[Long](words)
    q.indices.foreach { i =>
      if (q(i) >= 0.0) out(i / 32) |= (1L << (i % 32))
    }
    out
  }

  /** Hamming distance between a packed column and packed query words:
    * Σ_w popcount(xor) — pure codegen'd integer arithmetic. */
  def hamming(bitsCol: Column, qWords: Array[Long]): Column =
    qWords.indices.map { w =>
      bit_count(element_at(bitsCol, w + 1).bitwiseXOR(lit(qWords(w))))
        .cast("long")
    }.reduce(_ + _)

  /** Binary-quantized ANN: Hamming shortlist of `shortlist` candidates
    * over the packed bits (32× smaller than float32 — the scan reads
    * ⌈d/32⌉ longs per row), exact cosine re-rank to top-`k` (the
    * Faiss/Qdrant rescore step). Only the shortlist touches the
    * full-precision vectors. */
  def binaryTopK(vectors: DataFrame, idCol: String, vecCol: String,
                 query: Array[Double], k: Int, shortlist: Int,
                 dim: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val qWords = packBitsLocal(query)
    val encoded =
      if (vectors.columns.contains("bits")) vectors
      else vectors.withColumn("bits", packBits(col(vecCol), dim))
    val cands = encoded
      .withColumn("hamming", hamming(col("bits"), qWords))
      .orderBy(col("hamming"), col(idCol))
      .limit(shortlist)
    cands
      .withColumn("score",
        V.cosine(col(vecCol), array(query.toIndexedSeq.map(lit): _*)))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("hamming"), col("score"))
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
