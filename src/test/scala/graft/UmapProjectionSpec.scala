package graft

import org.apache.spark.sql.functions._

import graft.operators.Projection

/** UMAP-shaped reducer (ref projection_service.py:235-500): the fit is
  * driver-side over a bounded sample like the reference's umap-learn
  * call, but seeded — so the contract to verify is (a) bit-identical
  * reruns, (b) the layout actually reflects neighborhood structure,
  * (c) the sample bound holds. */
class UmapProjectionSpec extends SparkSpec {
  import spark.implicits._

  // three angularly-separated clusters (cosine metric): each cluster
  // hugs one of three orthogonal directions in 12-dim space
  private lazy val clustered = {
    val rnd = new scala.util.Random(11)
    val dim = 12
    val rows = (0 until 90).map { i =>
      val axis = i % 3 * 4 // clusters at dims 0, 4, 8
      val v = Array.fill(dim)(rnd.nextGaussian() * 0.05)
      v(axis) += 1.0
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("umap2d is deterministic for a fixed seed") {
    val a = Projection.umap2d(clustered, "vec_id", "embedding", 12,
      nNeighbors = 10, epochs = 50).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val b = Projection.umap2d(clustered, "vec_id", "embedding", 12,
      nNeighbors = 10, epochs = 50).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(a.sameElements(b), "same seed must reproduce bit-identically")
  }

  test("umap2d separates angularly-distinct clusters in the plane") {
    val pts = Projection.umap2d(clustered, "vec_id", "embedding", 12,
      nNeighbors = 10, epochs = 100).collect()
      .map(r => (r.getLong(0) % 3, (r.getDouble(1), r.getDouble(2))))
    val byCluster = pts.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def centroid(ps: Array[(Double, Double)]) =
      (ps.map(_._1).sum / ps.length, ps.map(_._2).sum / ps.length)
    def dist(a: (Double, Double), b: (Double, Double)) =
      math.hypot(a._1 - b._1, a._2 - b._2)
    val cents = byCluster.view.mapValues(centroid).toMap
    // mean intra-cluster spread strictly below every centroid gap
    val spread = byCluster.map { case (c, ps) =>
      ps.map(p => dist(p, cents(c))).sum / ps.length
    }.max
    val gaps = for {
      a <- cents.keys; b <- cents.keys if a < b
    } yield dist(cents(a), cents(b))
    assert(gaps.min > spread * 2,
      s"clusters must separate: min gap ${gaps.min} vs spread $spread")
  }

  test("umap2d honors the sample limit and output schema") {
    val got = Projection.umap2d(clustered, "vec_id", "embedding", 12,
      nNeighbors = 5, sampleLimit = 40, epochs = 20)
    assert(got.columns.toSeq == Seq("vec_id", "x", "y"))
    assert(got.count() == 40)
    // deterministic sample: the 40 smallest ids
    assert(got.agg(max("vec_id")).head().getLong(0) == 39L)
  }
}
