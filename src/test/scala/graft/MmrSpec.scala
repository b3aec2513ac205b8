package graft

import graft.operators.Mmr

/** MMR greedy selection: relevance-first opening pick, diversity
  * penalty displacing near-duplicates, tie determinism, and the
  * k-exhaustion edge. */
class MmrSpec extends SparkSpec {

  private def unit(xs: Double*): Array[Double] = {
    val a = xs.toArray
    val n = math.sqrt(a.map(x => x * x).sum)
    a.map(_ / n)
  }

  test("pick 1 is the pure relevance argmax; a near-duplicate of it " +
      "is displaced by a less relevant but diverse candidate") {
    val e1 = unit(1.0, 0.0)
    val e2 = unit(0.0, 1.0)
    val cands = Seq(
      (1L, 1.0, e1),              // top relevance
      (2L, 0.95, e1),             // near-duplicate of 1 (sim = 1):
                                  //   0.7*0.95 - 0.3*1.0 = 0.365
      (3L, 0.6, e2))              // diverse (sim 0): 0.7*0.6 = 0.42
    val got = Mmr.select(cands, k = 3, lambda = 0.7,
      oneMinusLambda = 0.3)
    assert(got.map(_._2) == Seq(1L, 3L, 2L), got.toString)
    // pick 1's mmr is pure lambda*rel (no penalty yet)
    assert(got.head._4 == 0.7)
    // pick 2 (doc 3): 0.7*0.6 - 0.3*0 (orthogonal) = 0.42
    assert(got(1)._4 == 0.42)
    // pick 3 (doc 2): 0.7*0.95 - 0.3*1.0 = 0.365 — still selected
    // last because only it remains
    assert(got(2)._2 == 2L)
  }

  test("lambda = 1 degenerates to the relevance ranking; ties break " +
      "to the smallest id; k beyond the candidate count exhausts") {
    val v = Seq(unit(1.0, 0.0), unit(0.8, 0.6), unit(0.0, 1.0))
    val cands = Seq((30L, 0.5, v(0)), (10L, 0.5, v(1)), (20L, 0.9, v(2)))
    val got = Mmr.select(cands, k = 10, lambda = 1.0,
      oneMinusLambda = 0.0)
    assert(got.map(_._2) == Seq(20L, 10L, 30L), got.toString)
    assert(got.size == 3, "k beyond candidates exhausts the set")
    assert(got.map(_._1) == Seq(1, 2, 3))
  }
}
