package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

/** Pure-function goldens — tokenizer, mock embedding (bit-exact vs the
  * reference's Python output), sentence split, Jaccard, cleaning. */
class TextFunctionsSpec extends AnyFunSuite {

  test("tokenize: lowercase, hyphens-in-word, min length, stopwords") {
    assert(tokenize("Hello big-world x a_b 1 THE data") ==
      Seq("hello", "big-world", "a_b", "data"))
    assert(tokenize("") == Seq.empty)
    assert(tokenize(null) == Seq.empty)
    // '--' does not join words; leading/trailing hyphens split off
    assert(tokenize("a--b foo-bar-baz") == Seq("foo-bar-baz"))
    assert(tokenize("The the THE", removeStopwords = false) ==
      Seq("the", "the", "the"))
  }

  test("stopword list matches the reference (85 distinct words)") {
    // bm25_sparse_indexer.py:59-147 lists 85 distinct words (SURVEY.md's
    // "89" overcounted); verified equal set via diff against the source
    assert(EnglishStopwords.size == 85)
  }

  test("mock embedding is bit-exact vs the reference implementation") {
    // goldens computed with the reference algorithm
    // (packages/vecpipe/search/dense_search.py:19-44) via hashlib
    val hw = mockEmbeddingDouble("hello world", 16)
    val expHw = Seq(0.342343475186, 0.115316938486, 0.222135217728,
      0.540632128659, 0.409364089620, -0.033897838615, 0.098787474601,
      0.591091201703, 0.0, 0.0)
    expHw.zipWithIndex.foreach { case (e, i) =>
      assert(math.abs(hw(i) - e) < 1e-11, s"dim $i: ${hw(i)} != $e")
    }
    assert(hw.length == 16 && hw(15) == 0.0)

    val sp = mockEmbeddingDouble("spark", 16)
    assert(math.abs(sp(0) - 0.125300897941) < 1e-11)
    assert(math.abs(sp(6) - (-0.503900683580)) < 1e-11)

    val emp = mockEmbeddingDouble("", 16)
    assert(math.abs(emp(0) - 0.673867804267) < 1e-11)

    // default dim pads with zeros; normalization unaffected
    val big = mockEmbeddingDouble("hello world", 1024)
    assert(big.length == 1024)
    assert(math.abs(big(0) - 0.342343475186) < 1e-11)
    assert(big(8) == 0.0 && big(1023) == 0.0)
    // unit norm
    assert(math.abs(big.map(x => x * x).sum - 1.0) < 1e-12)
  }

  test("sentence split tracks offsets") {
    val s = splitSentences("One two. Three four! Five")
    assert(s.map(_.text) == Seq("One two. ", "Three four! ", "Five"))
    assert(s.map(_.start) == Seq(0, 9, 21))
    assert(s.last.end == 25)
    assert(splitSentences("") == Seq.empty)
    // reconstruction: concatenating the pieces restores the input
    val text = "A. B? C! D"
    assert(splitSentences(text).map(_.text).mkString == text)
  }

  test("cleanText collapses whitespace and drops empty lines") {
    assert(cleanText("a   b\n\n  c\td  \n") == "a b\nc d")
  }

  test("jaccard") {
    assert(jaccard(Seq("a", "b"), Seq("b", "c")) == 1.0 / 3)
    assert(jaccard(Seq.empty, Seq.empty) == 0.0)
    assert(jaccard(Seq("a"), Seq("a", "a")) == 1.0)
  }
}
