package graft

import org.apache.spark.sql.functions._

import graft.operators.{Knn, Skew}

class IvfSkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001",
    "embeddings").cache()

  test("IVF with all clusters probed equals brute force") {
    val q = emb.filter($"vec_id" === 3).head().getSeq[Float](1)
      .map(_.toDouble).toArray
    val centroids = Knn.ivfFit(emb, "vec_id", "embedding", 64, k = 8,
      iters = 2)
    assert(centroids.size == 8)
    val exact = Knn.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSeq
    val allProbe = Knn.ivfTopK(emb, "vec_id", "embedding", q, 10,
      centroids, nprobe = 8).collect().map(_.getLong(0)).toSeq
    assert(allProbe == exact)
  }

  test("IVF with few probes returns a subset with decent recall") {
    val q = emb.filter($"vec_id" === 3).head().getSeq[Float](1)
      .map(_.toDouble).toArray
    val centroids = Knn.ivfFit(emb, "vec_id", "embedding", 64, k = 8,
      iters = 2)
    val exact = Knn.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val probed = Knn.ivfTopK(emb, "vec_id", "embedding", q, 10,
      centroids, nprobe = 3).collect().map(_.getLong(0)).toSet
    assert(probed.subsetOf(exact) || probed.intersect(exact).nonEmpty)
    // the query's own vector lives in the nearest-probed cluster
    assert(probed.contains(3L))
    // determinism
    val again = Knn.ivfFit(emb, "vec_id", "embedding", 64, 8, 2)
    assert(centroids.map(_.toSeq) == again.map(_.toSeq))
  }

  test("salted join equals plain join on skewed data") {
    // hot key: 90% of left rows share key 1
    val left = (1 to 1000).map(i =>
      (i.toLong, if (i <= 900) 1L else i.toLong % 50, s"v$i"))
      .toDF("row_id", "key", "payload")
    val right = (0L to 49L).map(k => (k, s"dim$k")).toDF("key", "dim")
    val plain = left.join(right, Seq("key"))
      .select("row_id", "key", "payload", "dim")
    val salted = Skew.saltedJoin(left, right, Seq("key"),
      saltBy = col("row_id"), numSalts = 8)
      .select("row_id", "key", "payload", "dim")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("two-phase aggregation equals direct aggregation") {
    val df = (1 to 500).map(i => (if (i <= 450) "hot" else s"k$i", i.toLong))
      .toDF("key", "v")
    val direct = df.groupBy("key")
      .agg(sum("v").as("s"), count("*").as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val twoPhase = Skew.twoPhaseAgg(df, Seq("key"), col("v"), 8,
      partialAggs = Seq(sum("v").as("ps"), count("*").as("pn")),
      finalAggs = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(direct == twoPhase)
  }
}
