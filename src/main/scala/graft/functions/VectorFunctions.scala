package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector scalar functions over `ArrayType(FloatType)` columns.
  *
  * Built from Spark's higher-order functions (`zip_with`/`aggregate`),
  * which evaluate inside whole-stage codegen — no UDF serialization in
  * the k-NN hot path. All math is done in double precision regardless of
  * the storage type (embeddings are float32 on disk).
  *
  * Ref semantics: cosine distance scoring in
  * packages/vecpipe/search/dense_search.py:75-137 (Qdrant COSINE) with
  * vectors L2-normalized at embed time
  * (packages/shared/embedding/dense.py:420-426).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision — custom codegen Expression (the
    * higher-order-function form is CodegenFallback and ~10× slower in
    * the scoring loop; kept below as dotHof for reference/tests). */
  def dot(a: Column, b: Column): Column = VectorExpressions.dotExpr(a, b)

  /** L2 norm ‖a‖₂. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Single-pass cosine similarity; 0.0 when either norm is zero. */
  def cosine(a: Column, b: Column): Column =
    VectorExpressions.cosineExpr(a, b)

  /** Interpreted higher-order-function twin of [[dot]] (reference
    * implementation for parity tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Cosine for pre-normalized vectors — just the dot product. Use this
    * in the k-NN path when the store guarantees unit vectors. */
  def cosinePreNormalized(a: Column, b: Column): Column = dot(a, b)

  /** L2-normalize, preserving element type double.
    * Ref: shared/embedding/dense.py:420-426 (normalize_embeddings). */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, transform(a, _.cast("double")))
      .otherwise(transform(a, v => v.cast("double") / n))
  }

  /** Squared Euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  // ---- pure-Scala twins for unit tests / driver-side constants ----

  def dotS(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  def cosineS(a: Array[Double], b: Array[Double]): Double = {
    val d = math.sqrt(dotS(a, a)) * math.sqrt(dotS(b, b))
    if (d == 0.0) 0.0 else dotS(a, b) / d
  }
}
