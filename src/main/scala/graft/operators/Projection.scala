package graft.operators

import breeze.linalg.{eigSym, DenseMatrix, DenseVector}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** 2-D projection of the embedding space (SURVEY.md §1.1 "Projection
  * run"; ref packages/webui/services/projection_service.py:235-500).
  *
  * The reference offers UMAP / t-SNE / PCA over a SAMPLE of the
  * vectors. PCA is the deterministic member and the only one with a
  * closed form, so it is the built-in; UMAP/t-SNE remain driver-side
  * sample jobs behind the same (sample → fit → project) shape.
  *
  * Spark split of work:
  *  - mean + covariance: distributed treeAggregate over partitions
  *    (a d×d accumulator per partition — genuine per-partition
  *    imperative logic, the one sanctioned RDD use)
  *  - eigendecomposition: driver-side on the tiny d×d matrix (breeze)
  *  - projection: two codegen dot products against literal component
  *    vectors — a narrow map over the full table, any scale
  * Sign convention: each component's largest-|loading| coordinate is
  * made positive, so output is reproducible across runs/partitionings.
  */
object Projection {

  /** Fit the top-2 principal components on (a sample of) `vectors`.
    * Returns (mean, pc1, pc2). */
  def fitPca(vectors: DataFrame, vecCol: String, dim: Int,
             sampleLimit: Int = 10000,
             orderCol: Option[String] = None): (Array[Double], Array[Double], Array[Double]) = {
    val sampled = orderCol match {
      case Some(c) => vectors.orderBy(col(c)).limit(sampleLimit)
      case None => vectors.limit(sampleLimit)
    }
    val rows = sampled.select(col(vecCol)).rdd.map { (r: Row) =>
      val s = r.getSeq[Any](0)
      val a = new Array[Double](dim)
      var i = 0
      while (i < dim && i < s.length) {
        a(i) = s(i) match {
          case f: Float => f.toDouble
          case d: Double => d
          case n: Number => n.doubleValue()
        }
        i += 1
      }
      a
    }

    // single pass: per-partition (count, sum, raw second moment)
    val zero = (0L, new Array[Double](dim), new DenseMatrix[Double](dim, dim))
    val (n, sum, m2) = rows.treeAggregate(zero)(
      seqOp = { case ((c, s, m), v) =>
        var i = 0
        while (i < dim) {
          s(i) += v(i)
          var j = 0
          while (j < dim) { m(i, j) += v(i) * v(j); j += 1 }
          i += 1
        }
        (c + 1, s, m)
      },
      combOp = { case ((c1, s1, m1), (c2, s2, m2)) =>
        var i = 0
        while (i < dim) { s1(i) += s2(i); i += 1 }
        m1 += m2
        (c1 + c2, s1, m1)
      })
    require(n > 1, s"need > 1 vectors to fit PCA, got $n")

    val mean = sum.map(_ / n)
    // covariance = E[xxᵀ] − μμᵀ  (population; deterministic)
    val cov = new DenseMatrix[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        cov(i, j) = m2(i, j) / n - mean(i) * mean(j)
        j += 1
      }
      i += 1
    }
    val eig = eigSym(cov)
    // eigSym returns ascending eigenvalues; take the top two
    def component(k: Int): Array[Double] = {
      val v: DenseVector[Double] = eig.eigenvectors(::, dim - 1 - k)
      val arr = v.toArray
      // sign fix: largest-|coordinate| positive
      val maxIdx = arr.indices.maxBy(idx => math.abs(arr(idx)))
      if (arr(maxIdx) < 0) arr.map(-_) else arr
    }
    (mean, component(0), component(1))
  }

  /** Project every vector onto the fitted components:
    * (idCol, x, y). A pure narrow map — scales to the full table. */
  def project(vectors: DataFrame, idCol: String, vecCol: String,
              mean: Array[Double], pc1: Array[Double],
              pc2: Array[Double]): DataFrame = {
    val m = array(mean.toIndexedSeq.map(lit): _*)
    val centered = zip_with(col(vecCol), m, (v, mu) => v.cast("double") - mu)
    vectors.select(
      col(idCol),
      VectorFunctions.dot(centered, array(pc1.toIndexedSeq.map(lit): _*)).as("x"),
      VectorFunctions.dot(centered, array(pc2.toIndexedSeq.map(lit): _*)).as("y"))
  }

  /** Fit on a sample, project the full table (the projection_build
    * operation, ref models.py:97-146 op type `projection_build`). */
  def pca2d(vectors: DataFrame, idCol: String, vecCol: String, dim: Int,
            sampleLimit: Int = 10000): DataFrame = {
    val (mean, pc1, pc2) = fitPca(vectors, vecCol, dim, sampleLimit,
      orderCol = Some(idCol))
    project(vectors, idCol, vecCol, mean, pc1, pc2)
  }
}
