package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}

/** Product quantization (PQ) — the standard memory-compression path
  * for billion-scale similarity search (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011; the IVF-PQ
  * layout Faiss popularized).
  *
  * The reference delegates ANN to an HNSW index held in RAM
  * (packages/vecpipe/search/dense_search.py); at 100 TB the vectors
  * themselves no longer fit, so PQ re-expresses each d-dim float
  * vector as m one-byte codes (d·4 bytes → m bytes, 32× at d=64,m=8):
  *
  *  - fit: split dims into m subspaces of d/m; per subspace, Lloyd
  *    k-means over the sub-vectors. One scan per iteration for ALL
  *    subspaces; the update aggregates (subspace, code, dim) sums —
  *    m·k·(d/m) = k·d rows to the driver, never the data.
  *  - encode: per subspace, the id of the nearest centroid (L2).
  *    Pure column arithmetic over the fitted literals: narrow,
  *    codegen'd, embarrassingly parallel — run once at ingest and
  *    store the codes column.
  *  - ADC search: the query builds an m×k distance table DRIVER-side;
  *    each row's approximate distance is m array lookups + a fixed
  *    left-to-right sum. TakeOrderedAndProject keeps top-k.
  *  - refine: optional exact re-rank of the top ADC candidates.
  *
  * Determinism: centroid init is the first k vectors by id; argmin
  * ties break on the LOWEST code id via the struct-max trick (same as
  * Knn.ivfAssign); the ADC table is computed once on the driver and
  * embedded as literals in both the Spark plan and the DuckDB oracle.
  */
object Pq {

  /** codebook(s)(j) = centroid j of subspace s, each of length dsub. */
  final case class Codebook(dim: Int, m: Int, k: Int,
                            centroids: Seq[Seq[Array[Double]]]) {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub: Int = dim / m
  }

  private def litArr(a: Array[Double]): Column =
    array(a.toIndexedSeq.map(lit): _*)

  /** Nearest-code id for subspace `s` of `vecCol` — argmin over k of
    * ||x_s − c_j||², evaluated as argmax of 2·x_s·c_j − ||c_j||² (the
    * ||x_s||² term is constant per row). Ties pick the lowest j. */
  private def codeFor(vecCol: Column, cb: Codebook, s: Int): Column = {
    val sub = slice(vecCol, s * cb.dsub + 1, cb.dsub)
    val scored = cb.centroids(s).zipWithIndex.map { case (c, j) =>
      val c2 = c.map(x => x * x).sum
      struct((V.dot(sub, litArr(c)) * 2.0 - lit(c2)).as("sc"),
        lit(-j).as("negj"))
    }
    -greatest(scored: _*).getField("negj")
  }

  /** Add a `codes` column (array<int>, length m) to `vectors`. */
  def encode(vectors: DataFrame, vecCol: String, cb: Codebook): DataFrame =
    vectors.withColumn("codes",
      array((0 until cb.m).map(s => codeFor(col(vecCol), cb, s).cast("int")): _*))

  /** Fit the codebook: init from the first k vectors by id, then
    * `iters` Lloyd steps (assign with [[encode]], update via one
    * (subspace, code, dim) aggregation).
    *
    * Determinism: PER-RUN only. The centroid update sums doubles in
    * partition order, so codebooks can differ in the last ulps across
    * runs/partitionings. Consumers that need a stable codebook across
    * runs must persist the fitted literals (the ann_pq query memoizes
    * one fit and embeds the SAME literals in query and oracle); to make
    * fit itself canonical, aggregate per-partition partials and reduce
    * them in sorted partition order (cost: one extra driver-side pass),
    * which has not been needed on any current path. */
  def fit(vectors: DataFrame, idCol: String, vecCol: String, dim: Int,
          m: Int = 8, k: Int = 16, iters: Int = 2): Codebook = {
    val dsub = dim / m
    def toDouble(sq: Seq[Any]): Array[Double] = sq.map {
      case f: Float => f.toDouble
      case d: Double => d
      case n: Number => n.doubleValue()
    }.toArray
    val seed = vectors.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect().map(r => toDouble(r.getSeq[Any](0)))
    require(seed.nonEmpty, "Pq.fit needs a non-empty corpus")
    // corpora smaller than k degrade to k' = |corpus| codes rather
    // than indexing past the seed set in the update step
    val kEff = math.min(k, seed.length)
    var cb = Codebook(dim, m, kEff,
      (0 until m).map(s => seed.take(kEff).toIndexedSeq.map(v =>
        v.slice(s * dsub, (s + 1) * dsub))))
    for (_ <- 0 until iters) {
      val sums = encode(vectors, vecCol, cb)
        .select(col("codes"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .select((col("pos") / dsub).cast("int").as("s"),
          pmod(col("pos"), lit(dsub)).cast("int").as("p"),
          element_at(col("codes"), (col("pos") / dsub).cast("int") + 1).as("j"),
          col("v").cast("double").as("v"))
        .groupBy("s", "j", "p")
        .agg(sum("v").as("sv"), count(lit(1)).as("n"))
        .collect()
      val grouped = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
      cb = Codebook(dim, m, kEff, (0 until m).map { s =>
        (0 until kEff).map { j =>
          grouped.get((s, j)) match {
            case Some(rows) =>
              val a = new Array[Double](dsub)
              rows.foreach(r => a(r.getInt(2)) = r.getDouble(3) / r.getLong(4))
              a
            case None => cb.centroids(s)(j) // empty cluster keeps centroid
          }
        }
      })
    }
    cb
  }

  /** Driver-side m×k ADC table for an L2 query:
    * table(s)(j) = ||q_s − c_sj||². */
  def adcTable(query: Array[Double], cb: Codebook): Seq[Array[Double]] =
    (0 until cb.m).map { s =>
      cb.centroids(s).map { c =>
        var d2 = 0.0
        var i = 0
        while (i < cb.dsub) {
          val d = query(s * cb.dsub + i) - c(i)
          d2 += d * d
          i += 1
        }
        d2
      }.toArray
    }

  /** Approximate distance column: Σ_s table(s)(codes(s)), summed in
    * fixed subspace order (reproducible across engines). */
  def adcDistance(codesCol: Column, table: Seq[Array[Double]]): Column =
    table.zipWithIndex.map { case (t, s) =>
      element_at(litArr(t), element_at(codesCol, s + 1) + 1)
    }.reduce(_ + _)

  /** ADC top-k: encode (or reuse a stored `codes` column), look up the
    * per-subspace distances, keep the k smallest. Compiles to a narrow
    * scan + TakeOrderedAndProject. */
  def adcTopK(vectors: DataFrame, idCol: String, vecCol: String,
              query: Array[Double], k: Int, cb: Codebook): DataFrame = {
    val table = adcTable(query, cb)
    val encoded =
      if (vectors.columns.contains("codes")) vectors
      else encode(vectors, vecCol, cb)
    encoded
      .withColumn("adist", adcDistance(col("codes"), table))
      .select(col(idCol), col("adist"))
      .orderBy(col("adist").asc, col(idCol))
      .limit(k)
  }

  /** Full IVF-PQ search — the composition that serves billion-vector
    * corpora: coarse-probe the `nprobe` nearest IVF cells (partition
    * pruning when the table is laid out by cluster_id), score ONLY
    * those cells' compressed codes with ADC, then exact-refine the
    * shortlist. Memory: m bytes/vector + k·d floats of codebook;
    * compute per query: |probed cells| · m lookups + `shortlist` exact
    * distances. */
  def ivfPqTopK(vectors: DataFrame, idCol: String, vecCol: String,
                query: Array[Double], k: Int,
                centroids: Seq[Array[Double]], nprobe: Int,
                cb: Codebook, shortlist: Int): DataFrame = {
    val probed = Knn.ivfAssign(vectors, vecCol, centroids)
      .filter(col("cluster_id").isin(
        Knn.nearestCentroids(query, centroids, nprobe): _*))
      .drop("cluster_id")
    refinedTopK(probed, idCol, vecCol, query, k, cb, shortlist)
  }

  /** ADC shortlist of `c` candidates, exact cosine re-rank to top-k —
    * the IVF-PQ "refine" stage. */
  def refinedTopK(vectors: DataFrame, idCol: String, vecCol: String,
                  query: Array[Double], k: Int, cb: Codebook,
                  shortlist: Int): DataFrame = {
    val cands = adcTopK(vectors, idCol, vecCol, query, shortlist, cb)
      .select(col(idCol))
    vectors.join(cands, Seq(idCol), "left_semi")
      .transform(Knn.bruteForceTopK(_, idCol, vecCol, query, k))
  }
}
