package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Linear learning-to-rank rescoring — the SERVING-side plan shape of
  * an LTR ranker (Liu 2009, "Learning to Rank for Information
  * Retrieval"): a cheap first-phase retriever supplies a BOUNDED
  * candidate set; features join onto the candidates (never onto the
  * corpus — every feature join below is result-set-sized); the model
  * is a fixed dot product over the feature vector. Training the
  * weights is a model concern (out of engine scope, like the embedding
  * providers); the engine's job is the feature-extraction plan, which
  * is what this operator pins.
  *
  * Scale posture: candidates ≤ candidate_k per query, so every
  * normalization is a broadcast 1-row aggregate and every feature
  * join broadcasts the candidate ids — the corpus is touched only by
  * the first-phase retriever that produced the candidates.
  */
object Ltr {

  /** Min–max normalize `scoreCol` over the whole (candidate-sized)
    * frame into `out` ∈ [0,1] via a broadcast 1-row stats cross join;
    * a constant column normalizes to 1.0 (the [[Rrf.combSum]]
    * convention). */
  def minMaxNorm(df: DataFrame, scoreCol: String,
                 out: String): DataFrame = {
    val stats = broadcast(df.agg(min(col(scoreCol)).as("__mn"),
      max(col(scoreCol)).as("__mx")))
    df.crossJoin(stats)
      .withColumn(out,
        when(col("__mx") > col("__mn"),
          (col(scoreCol) - col("__mn")) / (col("__mx") - col("__mn")))
          .otherwise(lit(1.0)))
      .drop("__mn", "__mx")
  }

  /** Fixed-weight linear model: out = Σ wᵢ·fᵢ summed LEFT-TO-RIGHT in
    * the declared feature order — the fixed association keeps the
    * float result identical across engines (a caller-side oracle
    * writes the same expression in the same order). */
  def linearScore(df: DataFrame, features: Seq[(String, Double)],
                  out: String): DataFrame = {
    require(features.nonEmpty, "no features")
    df.withColumn(out,
      features.map { case (f, w) => lit(w) * col(f) }.reduceLeft(_ + _))
  }
}
