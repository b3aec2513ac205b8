package graft.operators

/** Maximal Marginal Relevance diversity re-ranking (Carbonell &
  * Goldstein, SIGIR 1998) — the "don't show ten copies of the same
  * answer" rerank every search/RAG product ships beside its relevance
  * rerank (W5's diversity sibling):
  *
  *   MMR(c) = λ·rel(c) − (1−λ)·max_{s ∈ S} sim(c, s)
  *
  * picked greedily k times over a candidate set (S = already picked).
  *
  * The greedy is inherently SEQUENTIAL (each pick changes every
  * remaining candidate's penalty), so it runs driver-side over the
  * COLLECTED candidates — the same bounded-collect discipline as the
  * tuning loops: candidate GENERATION stays distributed and the
  * collect is clamped by the candidate-k contract (≤ 200 rows),
  * never corpus-sized.
  *
  * Determinism contract (the oracle-replay discipline): `rel` should
  * be 6-dp pre-rounded by the caller; sims are raw doubles summed in
  * ascending index order (identical to the SQL twin's left-to-right
  * chain); the per-step score rounds to 6 dp BEFORE the argmax with
  * ties to the smallest id; λ and (1−λ) are caller-supplied literals
  * (pass 0.3, not 1.0 − 0.7 — the subtraction is not exact). */
object Mmr {

  /** Dot in ascending index order — the SQL twin's exact operation
    * order. Pre-normalized vectors make this cosine. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** @param cands      (id, rel, unitVec) — rel pre-rounded, vectors
    *                    pre-normalized
    * @param k           picks
    * @param lambda      relevance weight
    * @param oneMinusLambda the diversity weight AS A LITERAL
    * @return (rank 1-based, id, rel, mmr) in pick order */
  def select(cands: Seq[(Long, Double, Array[Double])], k: Int,
             lambda: Double, oneMinusLambda: Double)
      : Seq[(Int, Long, Double, Double)] = {
    require(k >= 1, s"bad k: $k")
    val remaining = scala.collection.mutable.LinkedHashMap(
      cands.map(c => c._1 -> c): _*)
    val picked = Seq.newBuilder[(Int, Long, Double, Double)]
    val pickedVecs = scala.collection.mutable.ArrayBuffer
      .empty[Array[Double]]
    var rank = 1
    while (rank <= k && remaining.nonEmpty) {
      val scored = remaining.valuesIterator.map { case (id, rel, v) =>
        val ms = if (pickedVecs.isEmpty) 0.0
          else pickedVecs.iterator.map(dot(v, _)).max
        (id, rel, round6(lambda * rel - oneMinusLambda * ms))
      }.toSeq
      val (id, rel, mmr) = scored.minBy { case (i, _, m) => (-m, i) }
      picked += ((rank, id, rel, mmr))
      pickedVecs += remaining(id)._3
      remaining.remove(id)
      rank += 1
    }
    picked.result()
  }
}
