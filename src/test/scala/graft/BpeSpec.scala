package graft

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, lit}

import graft.operators.Bpe

/** Corpus-trained BPE: golden merges, parity with an independent local
  * reference implementation, and encode invariants. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent in-memory BPE (same published algorithm, written
    * against the spec not the operator) for parity checks. */
  private def localBpe(texts: Seq[String], nMerges: Int)
      : (Seq[(String, String, Long)], Map[String, Seq[String]]) = {
    val wordRe = Bpe.WordPattern.r
    val counts = mutable.Map.empty[String, Long].withDefaultValue(0L)
    texts.foreach(t => wordRe.findAllIn(t).foreach(w => counts(w) += 1))
    var syms: Map[String, Seq[String]] =
      counts.keys.map(w => w -> w.map(_.toString)).toMap
    val merges = mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (merges.length < nMerges && !done) {
      val pc = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((w, ss) <- syms; i <- 0 until ss.length - 1)
        pc((ss(i), ss(i + 1))) += counts(w)
      if (pc.isEmpty) done = true
      else {
        val ((l, r), c) = pc.minBy { case ((l, r), c) => (-c, l, r) }
        if (c <= 0) done = true
        else {
          merges += ((l, r, c))
          syms = syms.map { case (w, ss) =>
            val out = mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < ss.length) {
              if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) {
                out += (l + r); i += 2
              } else { out += ss(i); i += 1 }
            }
            w -> out.toSeq
          }
        }
      }
    }
    (merges.toSeq, syms)
  }

  test("golden: merges on a tiny corpus, overlap is leftmost-greedy") {
    // "aaab" x3: pairs (a,a)x2 per word -> 6, (a,b) -> 3
    val docs = Seq((1L, "aaab"), (2L, "aaab"), (3L, "aaab")).toDF("doc_id", "text")
    val t = Bpe.train(docs, nMerges = 2, partitions = 2)
    // after (a,a): [aa, a, b]; remaining pairs tie at 3 — (aa,a) vs
    // (a,b) — and the (count DESC, left ASC, right ASC) rule picks
    // ("a","b") because "a" < "aa"
    assert(t.merges.map(m => (m.left, m.right, m.pairCount)) ===
      Seq(("a", "a", 6L), ("a", "b", 3L)))
    val (lm, _) = localBpe(Seq("aaab", "aaab", "aaab"), 2)
    assert(t.merges.map(m => (m.left, m.right, m.pairCount)) === lm)
  }

  test("parity with the independent local implementation on a mixed corpus") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs 42 42",
      "the the the theme theater theory",
      "aaa aaaa aaaaa abababab",
      "mixed CASE Words and CASE words")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val n = 12
    val t = Bpe.train(docs, nMerges = n, partitions = 2)
    val (lm, lsyms) = localBpe(texts, n)
    assert(t.merges.map(m => (m.left, m.right, m.pairCount)) === lm)
    // final vocabulary states agree word-for-word
    val got = t.vocab.select("word", "syms").as[(String, Seq[String])]
      .collect().toMap
    assert(got === lsyms)
  }

  test("off-config parity on the real sf0.001 corpus (n=60, not the " +
      "driver's 40) — the oracle equivalence is not pinned to one config") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val texts = docs.select("text").as[String].collect().toSeq
    val n = 60
    val t = Bpe.train(docs, nMerges = n, partitions = 2)
    val (lm, _) = localBpe(texts, n)
    assert(t.merges.map(m => (m.left, m.right, m.pairCount)) === lm)
  }

  test("scale invariance: a 10x-replicated corpus trains the identical " +
      "merge table with 10x counts") {
    // pair counts scale uniformly under corpus replication, so every
    // argmax — including tie-breaks — must be unchanged; a partitioning
    // or accumulation-order dependence would break this
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(100).select("doc_id", "text")
    val rep = (0 until 10).map(i =>
        docs.select((col("doc_id") + lit(i * 1000000)).as("doc_id"),
          col("text")))
      .reduce(_ unionByName _)
    val base = Bpe.train(docs, nMerges = 20, partitions = 2).merges
    val big = Bpe.train(rep, nMerges = 20, partitions = 4).merges
    assert(big.map(m => (m.left, m.right)) === base.map(m => (m.left, m.right)))
    assert(big.map(_.pairCount) === base.map(_.pairCount * 10))
  }

  test("relational argmax path (forced via maxDriverPairs=0) trains the " +
      "identical merge table and vocabulary") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the the the theme theater theory",
      "aaa aaaa aaaaa abababab")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val driver = Bpe.train(docs, nMerges = 10, partitions = 2)
    val relational = Bpe.train(docs, nMerges = 10, partitions = 2,
      maxDriverPairs = 0L) // every corpus exceeds 0 → relational path
    assert(relational.merges.map(m => (m.left, m.right, m.pairCount)) ===
      driver.merges.map(m => (m.left, m.right, m.pairCount)))
    val dv = driver.vocab.select("word", "syms")
      .as[(String, Seq[String])].collect().toMap
    val rv = relational.vocab.select("word", "syms")
      .as[(String, Seq[String])].collect().toMap
    assert(rv === dv)
  }

  test("train stops early when no pairs remain") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val t = Bpe.train(docs, nMerges = 5, partitions = 1)
    assert(t.merges.isEmpty)
    assert(t.vocab.count() === 3)
  }

  test("budgetChunks: exact budgets, word-atomic, over-budget word " +
      "gets its own chunk") {
    val docs = Seq(
      (1L, "aa bb aa bb aa bb"), // all 1-token words after merges? verify sums
      (2L, "zzzzzzzzzz")         // one word; may exceed any small budget
    ).toDF("doc_id", "text")
    val t = Bpe.train(docs, nMerges = 2, partitions = 1)
    val vocabSizes = t.vocab.select("word", "syms")
      .as[(String, Seq[String])].collect().toMap.view.mapValues(_.length.toLong)
    val budget = 3L
    val chunks = Bpe.budgetChunks(docs, t, budget)
      .orderBy("doc_id", "chunk_index")
      .as[(Long, Int, Int, Int, Long, Long)].collect()
    // every chunk except single-word over-budget ones is within budget
    chunks.foreach { case (_, _, sw, ew, nw, toks) =>
      assert(toks <= budget || nw == 1L, (sw, ew, nw, toks))
      assert(nw === (ew - sw + 1).toLong)
    }
    // chunks tile each doc's word stream with no gaps or overlaps
    val byDoc = chunks.groupBy(_._1)
    byDoc.foreach { case (_, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 === 0)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 === a._4 + 1)
        case _ =>
      }
    }
    // token sums per doc equal the encode totals
    val enc = Bpe.encode(docs, t).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    byDoc.foreach { case (doc, cs) =>
      assert(cs.map(_._6).sum === enc(doc))
    }
    // the single over-budget word forms its own chunk if it exceeds
    val zTokens = vocabSizes("zzzzzzzzzz")
    if (zTokens > budget)
      assert(byDoc(2L).toSeq === Seq((2L, 0, 0, 0, 1L, zTokens)))
  }

  /** Independent schedule-replay encode written against the spec: apply
    * the merge table in rank order, each a leftmost-greedy
    * non-overlapping pass. */
  private def localReplay(word: String, merges: Seq[(String, String)])
      : Seq[String] = {
    var ss: Seq[String] = word.map(_.toString)
    merges.foreach { case (l, r) =>
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < ss.length) {
        if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += ss(i); i += 1 }
      }
      ss = out.toSeq
    }
    ss
  }

  test("mergeVocab on the training corpus reproduces train's vocabulary " +
      "exactly (schedule replay == training application)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(200).select("doc_id", "text")
    val t = Bpe.train(docs, nMerges = 30, partitions = 2)
    val replayed = Bpe.mergeVocab(docs, t.merges)
      .select("word", "syms").as[(String, Seq[String])].collect().toMap
    val trained = t.vocab.select("word", "syms")
      .as[(String, Seq[String])].collect().toMap
    assert(replayed === trained)
  }

  test("mergeVocab encodes FOREIGN words by rank-order merge application " +
      "(parity with an independent local replay)") {
    val trainDocs = Seq((1L, "the theme theater low lower lowest"))
      .toDF("doc_id", "text")
    val t = Bpe.train(trainDocs, nMerges = 8, partitions = 1)
    val mergePairs = t.merges.map(m => (m.left, m.right))
    // foreign corpus: overlapping vocabulary plus entirely unseen words
    val foreign = Seq((1L, "the theology lowly wholly 1234 thethe"))
      .toDF("doc_id", "text")
    val got = Bpe.mergeVocab(foreign, t.merges)
      .select("word", "syms").as[(String, Seq[String])].collect().toMap
    val words = Seq("the", "theology", "lowly", "wholly", "1234", "thethe")
    assert(got.keySet === words.toSet)
    words.foreach { w =>
      assert(got(w) === localReplay(w, mergePairs), w)
    }
    // in-training-corpus words agree with the trained vocabulary
    val trained = t.vocab.select("word", "syms")
      .as[(String, Seq[String])].collect().toMap
    assert(got("the") === trained("the"))
  }

  test("encode and budgetChunks raise a typed failure on an uncovered " +
      "word instead of silently dropping it") {
    val trainDocs = Seq((1L, "aa bb cc")).toDF("doc_id", "text")
    val t = Bpe.train(trainDocs, nMerges = 2, partitions = 1)
    val foreign = Seq((1L, "aa bb zz")).toDF("doc_id", "text")
    val e1 = intercept[Exception] { Bpe.encode(foreign, t).collect() }
    assert(e1.getMessage.contains("does not cover word 'zz'"), e1.getMessage)
    val e2 = intercept[Exception] {
      Bpe.budgetChunks(foreign, t, budget = 3).collect()
    }
    assert(e2.getMessage.contains("does not cover word 'zz'"), e2.getMessage)
    // the mergeVocab path encodes the same corpus without error
    val fixed = Bpe.Trained(t.merges, Bpe.mergeVocab(foreign, t.merges))
    assert(Bpe.encode(foreign, fixed).count() === 1L)
  }

  test("encode: counts sum per doc; wordless docs keep a zero row") {
    val docs = Seq((1L, "the theme"), (2L, "...!!!"), (3L, "the"))
      .toDF("doc_id", "text")
    val t = Bpe.train(docs, nMerges = 3, partitions = 1)
    val enc = Bpe.encode(docs, t).collect()
      .map { case Row(d: Long, w: Long, b: Long) => d -> ((w, b)) }.toMap
    assert(enc.keySet === Set(1L, 2L, 3L))
    assert(enc(2L) === ((0L, 0L)))
    val vocabSizes = t.vocab.select("word", "syms")
      .as[(String, Seq[String])].collect().toMap.view.mapValues(_.length)
    assert(enc(1L)._2 === vocabSizes("the") + vocabSizes("theme"))
    assert(enc(3L) === ((1L, vocabSizes("the").toLong)))
    // token frequencies: sum of freq == total corpus symbol count
    val totalFreq = Bpe.tokenFrequencies(t).agg(org.apache.spark.sql.functions.sum("freq"))
      .as[Long].head()
    assert(totalFreq === 2L * vocabSizes("the") + vocabSizes("theme"))
  }
}
