package graft

import java.security.MessageDigest

import graft.functions.TextFunctions
import graft.operators.Winnow

/** Winnowing fingerprints: exact parity with a local reference
  * implementation (same md5 k-gram hashes, same rightmost-min window
  * rule), the 2/(w+1) density, the w+k-1 shared-run guarantee, and
  * the maxDf boilerplate guard in the pair join. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Local winnowing reference (independent control flow: explicit
    * per-window scan, not the min-key encoding). */
  private def localWinnow(text: String, k: Int, w: Int): Set[(String, Long)] = {
    val toks = TextFunctions.tokenize(text, removeStopwords = false)
    if (toks.length < k) return Set.empty
    val hs = toks.sliding(k).map(g => md5hex(g.mkString(" "))).toVector
    (w - 1 until hs.length).flatMap { e =>
      // rightmost minimum of window [e-w+1, e]
      var best = e - w + 1
      for (p <- e - w + 2 to e) if (hs(p) <= hs(best)) best = p
      Some((hs(best), best.toLong))
    }.toSet
  }

  private val doc1 = "the quick brown fox jumps over the lazy dog " +
    "while the cat sleeps near the warm fire all day long"
  private val doc2 = "a noisy bird jumps over the lazy dog while the " +
    "cat watches from a high branch in silence today"

  test("fingerprints equal the local reference, per document") {
    val df = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
    val got = Winnow.fingerprints(df, "doc_id", "text", k = 4, w = 4)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got(1L) == localWinnow(doc1, 4, 4), got(1L))
    assert(got(2L) == localWinnow(doc2, 4, 4), got(2L))
  }

  test("density is ~2/(w+1) on pseudo-random token streams") {
    val rnd = new scala.util.Random(3)
    val docs = (0 until 50).map { i =>
      (i.toLong, (0 until 200).map(_ => s"t${rnd.nextInt(5000)}")
        .mkString(" "))
    }.toDF("doc_id", "text")
    val nSel = Winnow.fingerprints(docs, "doc_id", "text", k = 4, w = 4)
      .count()
    val nGrams = 50L * (200 - 3)
    val density = nSel.toDouble / nGrams
    assert(density > 0.3 && density < 0.5, s"density=$density")
  }

  test("a shared run of w+k-1 tokens guarantees a shared fingerprint") {
    val run = (0 until 7).map(i => s"shared$i").mkString(" ") // w+k-1=7
    val rnd = new scala.util.Random(9)
    def noise(n: Int) =
      (0 until n).map(_ => s"n${rnd.nextInt(100000)}").mkString(" ")
    val df = Seq((1L, s"${noise(30)} $run ${noise(30)}"),
      (2L, s"${noise(25)} $run ${noise(35)}")).toDF("doc_id", "text")
    val pairs = Winnow.overlapPairs(df, "doc_id", "text", k = 4, w = 4,
      minShared = 1L, maxDf = 50L).collect()
    assert(pairs.length == 1 && pairs(0).getLong(0) == 1L &&
      pairs(0).getLong(1) == 2L, pairs.toSeq.toString)
  }

  test("maxDf drops boilerplate fingerprints before the pair join") {
    // every doc shares ONE boilerplate sentence; pairs must vanish
    // once maxDf is below the document count
    val boiler = "this content is provided for informational purposes"
    val df = (1L to 10L).map(i => (i, s"doc $i unique body $i $boiler"))
      .toDF("doc_id", "text")
    val loose = Winnow.overlapPairs(df, "doc_id", "text", 4, 4,
      minShared = 1L, maxDf = 50L).count()
    val strict = Winnow.overlapPairs(df, "doc_id", "text", 4, 4,
      minShared = 1L, maxDf = 5L).count()
    assert(loose > 0L && strict == 0L, s"loose=$loose strict=$strict")
  }

  test("short documents (< k tokens) contribute nothing") {
    val df = Seq((1L, "too short"), (2L, null: String))
      .toDF("doc_id", "text")
    assert(Winnow.fingerprints(df, "doc_id", "text", 4, 4)
      .collect().isEmpty)
  }
}
