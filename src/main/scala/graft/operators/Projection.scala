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

  /** Deterministic top-2 eigenvectors of a symmetric matrix via cyclic
    * Jacobi rotations in pure JVM arithmetic — no native BLAS/LAPACK,
    * so the result is BIT-stable across hosts (Java FP is strict since
    * JDK 17; sqrt is IEEE-exact), which the golden-pinned UMAP/t-SNE
    * driver queries require of their PCA init. Each returned
    * eigenvector is sign-pinned: largest-|coordinate| positive. */
  private[operators] def jacobiTop2(cov: Array[Array[Double]])
      : (Array[Double], Array[Double]) = {
    val d = cov.length
    val a = Array.tabulate(d, d)((i, j) => cov(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) { s += a(p)(q) * a(p)(q); q += 1 }
        p += 1
      }
      s
    }
    val scale = {
      var s = 0.0
      var i = 0
      while (i < d) { s = math.max(s, math.abs(a(i)(i))); i += 1 }
      math.max(s, 1e-300)
    }
    var sweep = 0
    while (sweep < 64 && offNorm > 1e-24 * scale * scale) {
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              (if (theta >= 0) 1.0 else -1.0) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // top-2 by (eigenvalue desc, column index asc) — the index
    // tiebreak keeps degenerate spectra deterministic
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    def pin(colIdx: Int): Array[Double] = {
      val w = Array.tabulate(d)(r => v(r)(colIdx))
      val mi = w.indices.maxBy(idx => math.abs(w(idx)))
      if (w(mi) < 0) w.map(-_) else w
    }
    (pin(order(0)), pin(order(1)))
  }

  /** Shared PCA-of-the-sample 2-D init for [[umap2d]] / [[tsne2d]]:
    * mean-center, d×d covariance, top-2 components via [[jacobiTop2]],
    * project the sample. Scaling is the caller's (±10 for UMAP,
    * stddev 1e-4 for t-SNE). */
  private def pcaInitProjections(x: Array[Array[Double]],
      dim: Int): Array[Array[Double]] = {
    val n = x.length
    val mean = new Array[Double](dim)
    var i = 0
    while (i < n) {
      var d = 0
      while (d < dim) { mean(d) += x(i)(d) / n; d += 1 }
      i += 1
    }
    val cov = Array.ofDim[Double](dim, dim)
    i = 0
    while (i < n) {
      var a = 0
      while (a < dim) {
        var b = 0
        while (b < dim) {
          cov(a)(b) += (x(i)(a) - mean(a)) * (x(i)(b) - mean(b)) / n
          b += 1
        }
        a += 1
      }
      i += 1
    }
    val (p1, p2) = jacobiTop2(cov)
    Array.tabulate(n) { r =>
      var (sx, sy) = (0.0, 0.0)
      var d = 0
      while (d < dim) {
        sx += (x(r)(d) - mean(d)) * p1(d); sy += (x(r)(d) - mean(d)) * p2(d)
        d += 1
      }
      Array(sx, sy)
    }
  }

  /** Fit on a sample, project the full table (the projection_build
    * operation, ref models.py:97-146 op type `projection_build`). */
  def pca2d(vectors: DataFrame, idCol: String, vecCol: String, dim: Int,
            sampleLimit: Int = 10000): DataFrame = {
    val (mean, pc1, pc2) = fitPca(vectors, vecCol, dim, sampleLimit,
      orderCol = Some(idCol))
    project(vectors, idCol, vecCol, mean, pc1, pc2)
  }

  /** UMAP-shaped 2-D reduction (ref projection_service.py:235-500:
    * reducer "umap" with n_neighbors=15, min_dist=0.1, metric=cosine
    * defaults, fitted over a bounded sample). The reference runs
    * umap-learn driver-side on the sampled vectors; this keeps the
    * exact same sample→fit shape — Spark does the (ordered,
    * deterministic) sampling scan, the fit runs on the driver over
    * ≤ sampleLimit points — but re-expresses the algorithm with a
    * SEEDED deterministic pipeline so repeated runs are bit-identical:
    * exact cosine k-NN, UMAP fuzzy simplicial-set weights (ρ/σ per
    * point, probabilistic-union symmetrization), PCA initialization,
    * and negative-sampling SGD with a per-run seeded RNG. Output is
    * the sample's layout (id, x, y) — the reference likewise stores
    * only the sampled projection as the run artifact. */
  def umap2d(vectors: DataFrame, idCol: String, vecCol: String, dim: Int,
             nNeighbors: Int = 15, minDist: Double = 0.1,
             sampleLimit: Int = 2000, epochs: Int = 200,
             seed: Long = 42L): DataFrame = {
    val spark = vectors.sparkSession
    val sampled = vectors.orderBy(col(idCol)).limit(sampleLimit)
      .select(col(idCol).cast("long"), col(vecCol)).collect()
    val n = sampled.length
    require(n > 2, s"need > 2 vectors to fit UMAP, got $n")
    val k = math.min(nNeighbors, n - 1)
    val ids = sampled.map(_.getLong(0))
    val x = sampled.map { r =>
      val s = r.getSeq[Any](1)
      val a = new Array[Double](dim)
      var i = 0
      while (i < dim && i < s.length) {
        a(i) = s(i) match {
          case f: Float => f.toDouble
          case d: Double => d
          case m: Number => m.doubleValue()
        }
        i += 1
      }
      a
    }

    // --- exact cosine k-NN over the sample (O(n²·dim), n ≤ sampleLimit)
    val norms = x.map(v => math.sqrt(v.map(d => d * d).sum) max 1e-12)
    def cosDist(i: Int, j: Int): Double = {
      var s = 0.0; var d = 0
      while (d < dim) { s += x(i)(d) * x(j)(d); d += 1 }
      1.0 - s / (norms(i) * norms(j))
    }
    val nbr = Array.ofDim[Int](n, k)
    val nbrD = Array.ofDim[Double](n, k)
    var i = 0
    while (i < n) {
      val cand = Array.tabulate(n)(j => (cosDist(i, j), j))
      // ties broken by index — fully deterministic neighbor sets
      val top = cand.filter(_._2 != i).sortBy(t => (t._1, t._2)).take(k)
      var j = 0
      while (j < k) { nbrD(i)(j) = top(j)._1; nbr(i)(j) = top(j)._2; j += 1 }
      i += 1
    }

    // --- fuzzy simplicial set: ρ_i = nearest distance; σ_i solved so
    // Σ_j exp(-(max(0, d_ij - ρ_i))/σ_i) = log₂(k)  (the UMAP paper's
    // smooth-kNN calibration), then probabilistic-union symmetrization
    val target = StrictMath.log(k.toDouble) / StrictMath.log(2.0)
    val edgeW = scala.collection.mutable.LinkedHashMap.empty[(Int, Int), Double]
    i = 0
    while (i < n) {
      val rho = nbrD(i)(0)
      var lo = 1e-4; var hi = 1e4
      var it = 0
      while (it < 64) {
        val mid = (lo + hi) / 2
        var s = 0.0; var j = 0
        while (j < k) { s += StrictMath.exp(-math.max(0.0, nbrD(i)(j) - rho) / mid); j += 1 }
        if (s > target) hi = mid else lo = mid
        it += 1
      }
      val sigma = (lo + hi) / 2
      var j = 0
      while (j < k) {
        val w = StrictMath.exp(-math.max(0.0, nbrD(i)(j) - rho) / sigma)
        val key = if (i < nbr(i)(j)) (i, nbr(i)(j)) else (nbr(i)(j), i)
        val prev = edgeW.getOrElse(key, 0.0)
        edgeW(key) = prev + w - prev * w // fuzzy union
        j += 1
      }
      i += 1
    }
    val edges = edgeW.toArray.sortBy { case ((a, b), _) => (a, b) }

    // --- (a, b) from min_dist: deterministic coarse-to-fine least
    // squares of 1/(1+a·d^{2b}) against the paper's target curve
    // ψ(d) = 1 for d ≤ min_dist, exp(-(d - min_dist)) beyond
    val grid = (0 until 300).map(t => minDist * 3.0 * (t + 1) / 300.0)
    def sse(a: Double, b: Double): Double = grid.map { d =>
      val psi = if (d <= minDist) 1.0 else StrictMath.exp(-(d - minDist))
      val f = 1.0 / (1.0 + a * StrictMath.pow(d, 2 * b))
      (psi - f) * (psi - f)
    }.sum
    var (bestA, bestB) = (1.0, 1.0)
    var (loA, hiA, loB, hiB) = (0.05, 10.0, 0.05, 2.5)
    var round = 0
    while (round < 4) {
      var best = Double.MaxValue
      var ai = 0
      while (ai < 20) {
        val a = loA + (hiA - loA) * ai / 19.0
        var bi = 0
        while (bi < 20) {
          val b = loB + (hiB - loB) * bi / 19.0
          val e = sse(a, b)
          if (e < best) { best = e; bestA = a; bestB = b }
          bi += 1
        }
        ai += 1
      }
      val (spanA, spanB) = ((hiA - loA) / 10, (hiB - loB) / 10)
      loA = math.max(0.01, bestA - spanA); hiA = bestA + spanA
      loB = math.max(0.01, bestB - spanB); hiB = bestB + spanB
      round += 1
    }
    val (pa, pb) = (bestA, bestB)

    // --- init: PCA of the sample (driver-side d×d eig), scaled to ±10
    val y = pcaInitProjections(x, dim)
    val maxAbs = math.max(1e-12, y.map(p => math.max(math.abs(p(0)), math.abs(p(1)))).max)
    y.foreach { p => p(0) = p(0) / maxAbs * 10; p(1) = p(1) / maxAbs * 10 }

    // --- seeded negative-sampling SGD (gradients clipped to ±4 as in
    // the reference implementation of UMAP)
    val rnd = new java.util.Random(seed)
    val nNeg = 5
    def clip(v: Double): Double = math.max(-4.0, math.min(4.0, v))
    var epoch = 0
    while (epoch < epochs) {
      val alpha = 1.0 * (1.0 - epoch.toDouble / epochs)
      var e = 0
      while (e < edges.length) {
        val ((a, b), w) = edges(e)
        val d2 = {
          val dx = y(a)(0) - y(b)(0); val dy = y(a)(1) - y(b)(1)
          dx * dx + dy * dy
        }
        if (d2 > 0.0) {
          val gc = -2.0 * pa * pb * StrictMath.pow(d2, pb - 1) /
            (1.0 + pa * StrictMath.pow(d2, pb))
          var c = 0
          while (c < 2) {
            val g = clip(gc * (y(a)(c) - y(b)(c))) * w * alpha
            y(a)(c) += g; y(b)(c) -= g
            c += 1
          }
        }
        var s = 0
        while (s < nNeg) {
          val r = rnd.nextInt(n)
          if (r != a) {
            val d2n = {
              val dx = y(a)(0) - y(r)(0); val dy = y(a)(1) - y(r)(1)
              dx * dx + dy * dy
            }
            val gc = 2.0 * pb / ((0.001 + d2n) * (1.0 + pa * StrictMath.pow(d2n, pb)))
            var c = 0
            while (c < 2) {
              y(a)(c) += clip(gc * (y(a)(c) - y(r)(c))) * w * alpha
              c += 1
            }
          }
          s += 1
        }
        e += 1
      }
      epoch += 1
    }

    import spark.implicits._
    ids.indices.map(r => (ids(r), y(r)(0), y(r)(1)))
      .toDF(idCol, "x", "y")
  }

  /** t-SNE 2-D reduction (ref projection_service.py:269-314: reducer
    * "tsne" with perplexity=30, learning_rate=200, n_iter≥250,
    * metric=euclidean, init=pca defaults, fitted over a bounded
    * sample). Same driver-side sample→fit contract as [[umap2d]], but
    * fully DETERMINISTIC without a seed: exact t-SNE (van der Maaten
    * 2008) with PCA initialization has no random draws — pairwise
    * affinities with per-point σ from a binary search on perplexity,
    * early exaggeration, and momentum gradient descent with adaptive
    * gains are all closed-form. Output is the sample's layout
    * (id, x, y), the artifact the reference stores. */
  def tsne2d(vectors: DataFrame, idCol: String, vecCol: String, dim: Int,
             perplexity: Double = 30.0, learningRate: Double = 200.0,
             nIter: Int = 1000, sampleLimit: Int = 2000): DataFrame = {
    require(nIter >= 250, s"n_iter must be >= 250, got $nIter") // ref :296
    require(perplexity > 0, s"perplexity must be > 0")          // ref :282
    val spark = vectors.sparkSession
    val sampled = vectors.orderBy(col(idCol)).limit(sampleLimit)
      .select(col(idCol).cast("long"), col(vecCol)).collect()
    val n = sampled.length
    require(n > 2, s"need > 2 vectors to fit t-SNE, got $n")
    val ids = sampled.map(_.getLong(0))
    val x = sampled.map { r =>
      val s = r.getSeq[Any](1)
      val a = new Array[Double](dim)
      var i = 0
      while (i < dim && i < s.length) {
        a(i) = s(i) match {
          case f: Float => f.toDouble
          case d: Double => d
          case m: Number => m.doubleValue()
        }
        i += 1
      }
      a
    }

    // --- pairwise squared euclidean distances (O(n²·dim), bounded)
    val d2 = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        var s = 0.0; var d = 0
        while (d < dim) { val t = x(i)(d) - x(j)(d); s += t * t; d += 1 }
        d2(i)(j) = s; d2(j)(i) = s
        j += 1
      }
      i += 1
    }

    // --- conditional affinities: binary-search beta_i = 1/(2σ²) so the
    // entropy of P_{·|i} hits log(perplexity) (50 halvings ≈ machine
    // precision); the effective perplexity is clamped to n−1 neighbors
    val logU = StrictMath.log(math.min(perplexity, (n - 1).toDouble))
    val p = Array.ofDim[Double](n, n)
    i = 0
    while (i < n) {
      var beta = 1.0; var betaMin = Double.NegativeInfinity
      var betaMax = Double.PositiveInfinity
      var it = 0
      while (it < 50) {
        var sumP = 0.0; var sumDP = 0.0
        var j = 0
        while (j < n) {
          if (j != i) {
            val e = StrictMath.exp(-d2(i)(j) * beta)
            sumP += e; sumDP += d2(i)(j) * e
          }
          j += 1
        }
        val sp = math.max(sumP, 1e-300)
        val h = StrictMath.log(sp) + beta * sumDP / sp // Shannon entropy
        if (h > logU) {
          betaMin = beta
          beta = if (betaMax.isInfinite) beta * 2 else (beta + betaMax) / 2
        } else {
          betaMax = beta
          beta = if (betaMin.isInfinite) beta / 2 else (beta + betaMin) / 2
        }
        it += 1
      }
      var sumP = 0.0
      var j = 0
      while (j < n) {
        if (j != i) { p(i)(j) = StrictMath.exp(-d2(i)(j) * beta); sumP += p(i)(j) }
        j += 1
      }
      val sp = math.max(sumP, 1e-300)
      j = 0
      while (j < n) { p(i)(j) /= sp; j += 1 }
      i += 1
    }
    // symmetrize: p_ij = (p_{j|i} + p_{i|j}) / 2n, floored away from 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val v = math.max((p(i)(j) + p(j)(i)) / (2.0 * n), 1e-12)
        p(i)(j) = v; p(j)(i) = v
        j += 1
      }
      i += 1
    }

    // --- init: PCA coordinates scaled to stddev 1e-4 (the init=pca
    // contract; deterministic via the sign-fixed pure-JVM eig)
    val y = pcaInitProjections(x, dim)
    var std = 0.0
    i = 0
    while (i < n) { std += y(i)(0) * y(i)(0) + y(i)(1) * y(i)(1); i += 1 }
    std = math.sqrt(std / (2 * n)) max 1e-300
    i = 0
    while (i < n) { y(i)(0) *= 1e-4 / std; y(i)(1) *= 1e-4 / std; i += 1 }

    // --- gradient descent: early exaggeration ×12 for the first 250
    // iterations, momentum 0.5→0.8 at 250, per-coordinate adaptive
    // gains — the classic (deterministic) optimizer schedule
    val exag = 12.0
    val exagUntil = 250
    val dy = Array.fill(n)(Array(0.0, 0.0))
    val gains = Array.fill(n)(Array(1.0, 1.0))
    val grad = Array.fill(n)(Array(0.0, 0.0))
    val qNum = Array.ofDim[Double](n, n)
    var iter = 0
    while (iter < nIter) {
      val pMul = if (iter < exagUntil) exag else 1.0
      val momentum = if (iter < 250) 0.5 else 0.8
      // q numerators (1 + ||y_i − y_j||²)⁻¹ and their sum
      var qSum = 0.0
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val dx0 = y(i)(0) - y(j)(0); val dx1 = y(i)(1) - y(j)(1)
          val q = 1.0 / (1.0 + dx0 * dx0 + dx1 * dx1)
          qNum(i)(j) = q; qNum(j)(i) = q
          qSum += 2 * q
          j += 1
        }
        i += 1
      }
      val qz = math.max(qSum, 1e-300)
      i = 0
      while (i < n) {
        grad(i)(0) = 0.0; grad(i)(1) = 0.0
        var j = 0
        while (j < n) {
          if (j != i) {
            val q = qNum(i)(j)
            val coef = 4.0 * (pMul * p(i)(j) - math.max(q / qz, 1e-300)) * q
            grad(i)(0) += coef * (y(i)(0) - y(j)(0))
            grad(i)(1) += coef * (y(i)(1) - y(j)(1))
          }
          j += 1
        }
        i += 1
      }
      i = 0
      while (i < n) {
        var c = 0
        while (c < 2) {
          // gain rises when gradient keeps direction, shrinks when it
          // flips — van der Maaten's adaptive-gain schedule
          gains(i)(c) =
            if (math.signum(grad(i)(c)) != math.signum(dy(i)(c)))
              gains(i)(c) + 0.2
            else math.max(gains(i)(c) * 0.8, 0.01)
          dy(i)(c) = momentum * dy(i)(c) -
            learningRate * gains(i)(c) * grad(i)(c)
          y(i)(c) += dy(i)(c)
          c += 1
        }
        i += 1
      }
      iter += 1
    }

    import spark.implicits._
    ids.indices.map(r => (ids(r), y(r)(0), y(r)(1)))
      .toDF(idCol, "x", "y")
  }
}
