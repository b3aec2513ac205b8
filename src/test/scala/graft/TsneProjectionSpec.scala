package graft

import org.apache.spark.sql.functions._

import graft.operators.Projection

/** t-SNE reducer (ref projection_service.py:269-314): driver-side fit
  * over a bounded sample, init=pca. Exact t-SNE with PCA init has no
  * random draws, so the contract to verify is (a) bit-identical
  * reruns with NO seed, (b) neighborhood structure survives the
  * reduction, (c) the sample bound and config guards hold. */
class TsneProjectionSpec extends SparkSpec {
  import spark.implicits._

  // three linearly-separated clusters in 12-dim space (euclidean
  // metric, the reference's t-SNE default)
  private lazy val clustered = {
    val rnd = new scala.util.Random(7)
    val dim = 12
    val rows = (0 until 90).map { i =>
      val axis = i % 3 * 4
      val v = Array.fill(dim)(rnd.nextGaussian() * 0.05)
      v(axis) += 1.0
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("tsne2d is deterministic without a seed (pca init)") {
    def run() = Projection.tsne2d(clustered, "vec_id", "embedding", 12,
      perplexity = 10.0, nIter = 250).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(run().sameElements(run()),
      "exact t-SNE with pca init must reproduce bit-identically")
  }

  test("tsne2d separates distinct clusters in the plane") {
    val pts = Projection.tsne2d(clustered, "vec_id", "embedding", 12,
      perplexity = 10.0, nIter = 400).collect()
      .map(r => (r.getLong(0) % 3, (r.getDouble(1), r.getDouble(2))))
    val byCluster = pts.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def centroid(ps: Array[(Double, Double)]) =
      (ps.map(_._1).sum / ps.length, ps.map(_._2).sum / ps.length)
    def dist(a: (Double, Double), b: (Double, Double)) =
      math.hypot(a._1 - b._1, a._2 - b._2)
    val cents = byCluster.view.mapValues(centroid).toMap
    val spread = byCluster.map { case (c, ps) =>
      ps.map(p => dist(p, cents(c))).sum / ps.length
    }.max
    val gaps = for {
      a <- cents.keys; b <- cents.keys if a < b
    } yield dist(cents(a), cents(b))
    assert(gaps.min > spread * 2,
      s"clusters must separate: min gap ${gaps.min} vs spread $spread")
  }

  test("tsne2d honors the sample limit, schema, and config guards") {
    val got = Projection.tsne2d(clustered, "vec_id", "embedding", 12,
      perplexity = 5.0, nIter = 250, sampleLimit = 40)
    assert(got.columns.toSeq == Seq("vec_id", "x", "y"))
    assert(got.count() == 40)
    assert(got.agg(max("vec_id")).head().getLong(0) == 39L)
    // the reference rejects n_iter < 250 and perplexity <= 0 (ref :282,:296)
    intercept[IllegalArgumentException] {
      Projection.tsne2d(clustered, "vec_id", "embedding", 12, nIter = 100)
    }
    intercept[IllegalArgumentException] {
      Projection.tsne2d(clustered, "vec_id", "embedding", 12,
        perplexity = 0.0)
    }
  }
}
